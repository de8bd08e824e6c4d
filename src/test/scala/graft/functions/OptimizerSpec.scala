package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class OptimizerSpec extends AnyFunSuite {

  /** Fresh session over the shared context: extensions apply at
    * session construction, and getOrCreate would otherwise return the
    * suite-shared session unchanged. */
  lazy val spark: SparkSession = {
    graft.TestSpark.spark // ensure the SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-tests")
      .withExtensions(ext => new graft.GraftExtensions().apply(ext))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("extensions make native functions SQL-callable") {
    assert(spark.sql("SELECT array_count_eq(array('a','b','a'), 'a')").head().getInt(0) == 2)
    assert(spark.sql("SELECT phrase_count(array('a','b','a','b'), array('a','b'))").head().getInt(0) == 2)
    assert(spark.sql("SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d))").head().getDouble(0) == 11.0)
  }

  test("NativeCountRewrite replaces size(filter(x = lit)) with array_count_eq") {
    // range() keeps the plan non-foldable (a LocalRelation or literal
    // input would be constant-folded right through the rewrite)
    spark.sql("SELECT array(cast(id AS string), 'a', 'a') AS arr FROM range(2)")
      .createOrReplaceTempView("nc_t")
    val df = spark.sql("SELECT size(filter(arr, x -> x = 'a')) AS n FROM nc_t")
    assert(df.queryExecution.optimizedPlan.toString.contains("array_count_eq"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 2))
    // flipped literal side
    val df2 = spark.sql("SELECT size(filter(arr, x -> '0' = x)) AS n FROM nc_t")
    assert(df2.queryExecution.optimizedPlan.toString.contains("array_count_eq"))
    assert(df2.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))
    // non-rewritable lambda stays a HOF and stays correct
    val df3 = spark.sql("SELECT size(filter(arr, x -> length(x) > 1)) AS n FROM nc_t")
    assert(!df3.queryExecution.optimizedPlan.toString.contains("array_count_eq"))
    assert(df3.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 0))
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "payload")
    val small = Seq((0, "x"), (1, "y"), (2, "z")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).orderBy("k", "payload")
      .collect().map(_.toString).toSeq
    val salted = SkewUtils.saltedJoin(big, small, Seq("k"), 8, Seq($"payload"))
      .orderBy("k", "payload").collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 2, i.toLong)).toDF("k", "v")
    val got = SkewUtils.saltedSumCount(df, "k", "v", 4)
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    val want = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("sum"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("count"))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    assert(got == want)
  }
}
