package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic money arithmetic.
  *
  * The reference stores money as `double precision`
  * (reference `scripts/postgresql_setup.sql:28,39`) and we preserve
  * `DoubleType` in every schema. Plain `sum(double)` is
  * order-dependent, and at cluster scale the partition/merge order of a
  * shuffle (and AQE re-plans, speculative retries, skew splits) is not
  * stable — two runs of the same query could hash differently. All
  * engine aggregates over money therefore sum exact integer cents
  * (the source data is 2-decimal) and scale back once at the end:
  * associative, commutative, and bit-identical on any cluster layout.
  * Totals stay far below 2^53 cents even at 100 TB per group, and the
  * single final division is exact-input → deterministic double.
  */
object money {

  /** Exact cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-insensitive SUM for 2-decimal money columns. */
  def sumMoney(c: Column): Column = sum(cents(c)) / 100.0

  /** Order-insensitive AVG for 2-decimal money columns. */
  def avgMoney(c: Column): Column = sum(cents(c)) / 100.0 / count(c)
}
