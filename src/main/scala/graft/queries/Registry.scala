package graft.queries

/** All registered capability queries. SparkEntry exposes these to the
  * driver harness; each `QueryDef.oracle` is the DuckDB-equivalent SQL. */
object Registry {
  /** Module (query family) → its QueryDefs, in registration order. The
    * generated README catalog derives from THIS structure (plus the
    * latest CORRECTNESS json), so published query/family counts can
    * never drift from the registry. */
  def byModule: Seq[(String, Seq[QueryDef])] = Seq(
    "core" -> CoreQueries.defs,
    "relational" -> RelationalQueries.defs,
    "text" -> TextQueries.defs,
    "similarity" -> SimilarityQueries.defs,
    "extension" -> ExtensionQueries.defs,
    "pipelines" -> PipelineQueries.defs,
    "misc" -> MiscQueries.defs,
    "curation" -> CurationQueries.defs,
    "dataset" -> DatasetQueries.defs,
    "selection" -> SelectionQueries.defs,
    "alignment" -> AlignmentQueries.defs)

  def all: Seq[QueryDef] = byModule.flatMap(_._2)
}
