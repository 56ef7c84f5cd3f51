package graft

/** Dump the query registry as TSV (name, module, oracle|rows-only) for
  * `tools/gen_catalog.py`, which merges it with the latest CORRECTNESS
  * json into the README's generated catalog section. No SparkSession —
  * QueryDef holds builders, not executed plans. */
object Catalog {
  def main(args: Array[String]): Unit =
    graft.queries.Registry.byModule.foreach { case (module, defs) =>
      defs.foreach { d =>
        val kind = if (d.oracle.isDefined) "oracle" else "rows-only"
        println(s"${d.name}\t$module\t$kind")
      }
    }
}
