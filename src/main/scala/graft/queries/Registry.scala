package graft.queries

import scala.collection.immutable.ListMap

/** All verifiable queries, merged from the per-domain suites. */
object Registry {
  def all: ListMap[String, Q] =
    Relational.queries ++ TimeSeriesQ.queries ++ WindowQ.queries ++ SaxQ.queries ++ LlmQ.queries ++ CorpusQ.queries ++ TokenizerQ.queries ++ CleanQ.queries ++ ExtrasQ.queries ++ StatQ.queries ++ SeriesStatQ.queries ++ ExperimentQ.queries ++ GraphQ.queries ++ FinanceQ.queries ++ ServingQ.queries ++ FlagshipQ.queries ++ KilnQ.queries
}
