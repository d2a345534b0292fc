package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** CSV bulk load of reference-shaped seed tables — the engine's
  * equivalent of `COPY … FROM '/tmp/x.csv' DELIMITER ',' CSV HEADER`
  * (reference `scripts/postgresql_setup.sql:44-47`).
  *
  * Schemas are declared explicitly (never inferred — inference would
  * scan the data twice and can mistype at scale); the header row is
  * skipped and columns bind by position.
  */
object ReferenceCsv {

  def load(spark: SparkSession, path: String, table: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Schemas.tableSchemas(table))
      .csv(path)

  /** Load all four seed tables from a directory of
    * `{customers,merchants,products,transactions}.csv`. */
  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Schemas.tableSchemas.keys.map { t =>
      t -> load(spark, s"$dir/$t.csv", t)
    }.toMap
}
