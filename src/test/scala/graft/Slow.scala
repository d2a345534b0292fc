package graft

import org.scalatest.Tag

/** Long-haul properties — the soak-style maintainer sequences and the
  * multi-store crash kill matrices, which dominate the suite's wall
  * clock without guarding per-commit regressions. Excluded from the
  * default `sbt test` loop (build.sbt passes `-l graft.Slow` unless
  * `GRAFT_SLOW=1`); run them with
  *
  *   GRAFT_SLOW=1 sbt test            // everything
  *   sbt "testOnly * -- -n graft.Slow" // only the long-haul set
  *
  * and ALWAYS before a round close — the tag moves them out of the
  * per-commit loop, not out of the contract. */
object Slow extends Tag("graft.Slow")
