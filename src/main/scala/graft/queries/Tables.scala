package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access. Each query reads only the columns it needs so
  * the parquet scan prunes (ReadSchema) and filters push down. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
