package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Catalyst extensions installer — the deployment-time integration
  * point for the library's native expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs every [[graft.functions.SearchExpressions]] function
  * (array_count_eq, phrase_count, vec_dot, winnow_fingerprint,
  * shingle_hashes, ...) plus the [[graft.functions.NativeCountRewrite]]
  * optimizer rule into EVERY session of the application at build time,
  * so plain SQL users and thrift-server/Connect clients get them
  * without any library call. The runtime alternative for a session you
  * already hold is `SearchExpressions.register(spark)` — both install
  * from the same function table.
  *
  * (Reference analog: the engine's pluggable components are
  * class-name-configured — analyzers/similarity via LuceneConfig,
  * LuceneConfig.scala:110-123; this is the Spark-native equivalent
  * surface for the expression layer.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.SearchExpressions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.functions.NativeCountRewrite)
    // the SQL-visible search surface: the graft_search TABLE function
    // + the strategy planning it into the fused index-probe operator
    graft.plans.GraftSearchPlan.install(ext)
  }
}
