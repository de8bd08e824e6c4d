package graft.search

import graft.TestSpark
import graft.dsl.builders._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the hybrid sparse+dense RRF entry: the fused list is
  * exactly the top of the rank-reciprocal sum over the two legs, and
  * every fused doc comes from at least one leg (DuckDB hashes the
  * values; this pins the decomposition so a refactor cannot silently
  * change fusion semantics while staying plausible-looking). */
class HybridRrfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fused scores decompose into leg rank reciprocals") {
    val out = SearchQueries.queries("search_hybrid_rrf")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 10)

    // independently recompute both legs
    val lex = SearchQueries.indexFor(spark, dir)
      .lightSearch("text" matchAny termSet("spark", "join"), 20)
      .orderBy(col("score").desc, col("doc_id").asc)
      .select("doc_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    graft.functions.SearchExpressions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = e.where(col("vec_id") === 0).select(col("v").as("qv"))
    val vec = e.crossJoin(broadcast(qv))
      .select(col("vec_id"),
        graft.pipeline.Similarity.cosine(col("v"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(20)
      .select("vec_id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap

    val fused = (lex.keySet ++ vec.keySet).toSeq
      .map { d =>
        d -> (lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          vec.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      }
      .sortBy { case (d, s) => (-s, d) }.take(10)
      .map { case (d, s) =>
        d -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    assert(out == fused)
  }
}
