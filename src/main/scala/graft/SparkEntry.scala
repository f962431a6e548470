package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraphQueries, PipelineQueries, RelationalQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory aggregates three families:
  *  - [[graft.queries.GraphQueries]]      — the reference's traversal surface
  *  - [[graft.queries.RelationalQueries]] — scans/joins/aggs/windows/scalars
  *  - [[graft.queries.PipelineQueries]]   — dedup / similarity / text analysis
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * BFS over a fixture-derived graph — exercises source → iterative
    * traversal → window ordering end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_graph_bfs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++ PipelineQueries.queries ++
      TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query has one as of r11 —
    * q_graph_dfs_leaves (the last no_oracle row) now replays the
    * sequential DFS in a list-state recursive CTE. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ PipelineQueries.oracles ++
      TpchQueries.oracles
}
