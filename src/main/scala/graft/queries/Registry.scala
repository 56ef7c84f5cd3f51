package graft.queries

/** All registered capability queries. SparkEntry exposes these to the
  * driver harness; each `QueryDef.oracle` is the DuckDB-equivalent SQL. */
object Registry {
  def all: Seq[QueryDef] =
    CoreQueries.defs ++ RelationalQueries.defs ++ TextQueries.defs ++
      SimilarityQueries.defs ++ ExtensionQueries.defs ++ PipelineQueries.defs ++
      MiscQueries.defs ++ CurationQueries.defs ++ DatasetQueries.defs ++
      SelectionQueries.defs ++ AlignmentQueries.defs
}
