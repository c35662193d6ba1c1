package graft.tools
object Cnt { def main(a: Array[String]): Unit = {
  println("queries=" + graft.SparkEntry.queries.size)
  println("oracle=" + graft.SparkEntry.oracleSql.size)
  println("missing_oracle=" + (graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet).toSeq.sorted)
  println("orphan_oracle=" + (graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet).toSeq.sorted)
}}
