package graft.tools
object DumpSql {
  def main(args: Array[String]): Unit = args(0) match {
    case "sql" =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)),
        graft.queries.PipelineOps.oracle(args(2)))
    case "run" =>
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.SparkEntry.queries(args(2))(spark, args(3))
        .coalesce(1).write.mode("overwrite").parquet(args(1))
      spark.stop()
  }
}
