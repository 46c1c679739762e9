package graft.tools
/** Contract consistency probe: SparkEntry.queries keys vs static
  * oracleSql keys (the difference must be exactly the data-dependent
  * oracles that emit only after their models train). */
object KeysDump {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    // oracle map needs models for data-dependent entries; static part:
    val o = graft.SparkEntry.oracleSql.keySet
    println("queries=" + q.size + " oracles=" + o.size)
    println("queries-without-oracle=" + (q -- o).toSeq.sorted.mkString(","))
    println("oracles-without-query=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
