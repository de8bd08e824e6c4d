package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("IVF ANN is deterministic and recalls a good fraction of exact top-k") {
    val exact = Similarity.bruteForce(spark, dir, nQueries = 3, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf1 = Similarity.ivfTopK(spark, dir, nQueries = 3, k = 10, nCentroids = 8, nProbe = 3)
      .select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect().toSeq
    // clear the quantizer cache so the second call REFITS — otherwise
    // this determinism check would compare a cache hit with itself
    Similarity.clearIvfCache()
    val ivf2 = Similarity.ivfTopK(spark, dir, nQueries = 3, k = 10, nCentroids = 8, nProbe = 3)
      .select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(ivf1.sorted == ivf2.sorted, "IVF must be deterministic (fixed seed + fixed sample)")
    val byQ = ivf1.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // probing 3/8 cells: expect meaningful but partial recall
    val recalls = exact.keys.toSeq.map { qid =>
      val r = byQ.getOrElse(qid, Set.empty)
      r.intersect(exact(qid)).size.toDouble / exact(qid).size
    }
    assert(recalls.sum / recalls.size > 0.2,
      s"mean recall too low: ${recalls.mkString(",")}")
  }

  test("ivfRecall agrees with a driver-side recount of both legs") {
    import org.apache.spark.sql.functions.col
    val out = Similarity.ivfRecall(spark, dir, nQueries = 4, k = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == (0L until 4L).toSeq)
    assert(out.forall(r => r._2 >= 0 && r._2 <= 8))
    assert(out.forall(r => math.abs(r._3 - r._2 / 8.0) < 1e-9))
    // recount: intersect the two operators' id sets directly
    val exact = Similarity.bruteForce(spark, dir, nQueries = 4, k = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.ivfTopK(spark, dir, nQueries = 4, k = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (qid, nHit, _) =>
      assert(nHit == exact(qid).intersect(approx.getOrElse(qid, Set.empty)).size,
        s"qid $qid hit count")
    }
    // the default probe budget recalls most of the exact set here
    assert(out.map(_._3).sum / out.length > 0.5)
  }

  test("IVF-PQ recall at equal probe budget matches the plain-IVF baseline") {
    val nQ = 3; val k = 10; val nc = 8; val np = 3
    val exact = Similarity.bruteForce(spark, dir, nQueries = nQ, k = k)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(rows: Seq[(Long, Long)]): Double = {
      val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.keys.toSeq.map { qid =>
        byQ.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / exact(qid).size
      }
      rs.sum / rs.size
    }
    val ivf = Similarity.ivfTopK(spark, dir, nQueries = nQ, k = k,
      nCentroids = nc, nProbe = np)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSeq
    val pq = Similarity.ivfPqTopK(spark, dir, nQueries = nQ, k = k,
      nCentroids = nc, nProbe = np, rerank = 128)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSeq
    // with an exact re-rank whose shortlist comfortably covers k, the
    // PQ approximation only reorders candidates WITHIN the probed
    // cells — recall vs exact must not fall below the plain-IVF
    // baseline at the same probe budget
    assert(recall(pq) >= recall(ivf),
      s"IVF-PQ recall ${recall(pq)} fell below IVF ${recall(ivf)}")
    // determinism across a refit (both KMeans stages seeded)
    val pq1 = Similarity.ivfPqTopK(spark, dir, nQueries = nQ, k = k,
      nCentroids = nc, nProbe = np, rerank = 128)
      .select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect().toSeq
    Similarity.clearCaches()
    val pq2 = Similarity.ivfPqTopK(spark, dir, nQueries = nQ, k = k,
      nCentroids = nc, nProbe = np, rerank = 128)
      .select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect().toSeq
    assert(pq1.sorted == pq2.sorted, "IVF-PQ must be deterministic")
  }

  test("append-encode parity: appended codes equal the all-at-once encode") {
    import org.apache.spark.sql.functions.col
    val store = "/tmp/graft_fixtures/pq_parity_spec"
    // full store = ground truth for the slice's codes
    Similarity.savePqIndex(spark, dir, store + "_full")
    // partial store + encode-only append of the held-out tenth
    Similarity.savePqIndex(spark, dir, store,
      codesFilter = Some(col("vec_id") % 10 =!= 9))
    Similarity.appendToPqIndex(spark, dir, store, col("vec_id") % 10 === 9)
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).sortBy(_._1).toList
    // the appended store must be byte-for-byte the full encode —
    // the duplicated assignment/encoding expressions in
    // appendToPqIndex cannot drift from pqEncoded's
    assert(codesOf(store) == codesOf(store + "_full"))
  }

  test("streaming PQ ingest equals the all-at-once encode; survives a mid-stream crash") {
    import org.apache.spark.sql.functions.col
    import org.apache.hadoop.fs.Path
    def codesOf(p: String) = spark.read.parquet(s"$p/codes")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).sortBy(_._1).toList
    // ground truth: one save over everything
    val full = java.nio.file.Files.createTempDirectory("pq_str_full").toString
    Similarity.savePqIndex(spark, dir, full)
    // streamed: 80% seed + the last fifth as a 4-micro-batch stream
    val st = java.nio.file.Files.createTempDirectory("pq_str").toString
    Similarity.savePqIndex(spark, dir, st,
      codesFilter = Some(col("vec_id") % 5 =!= 4))
    Similarity.streamIngestPqIndex(spark, dir, st, col("vec_id") % 5 === 4)
    assert(codesOf(st) == codesOf(full),
      "stream-appended codes must be byte-for-byte the full encode")
    // mid-stream crash: a previous batch died after the marker of a
    // CONCURRENT removal — the next batch's recoverPqStore must roll
    // the store forward before its codes land, and the final probe
    // must equal (full store) minus (removed slice) plus nothing else
    val cr = java.nio.file.Files.createTempDirectory("pq_str_crash").toString
    Similarity.savePqIndex(spark, dir, cr,
      codesFilter = Some(col("vec_id") % 5 =!= 4))
    // manufacture the post-marker crash window (IvfSpec window B)
    spark.read.parquet(s"$cr/codes").where(col("vec_id") % 7 =!= 3)
      .write.parquet(s"$cr/_staged/codes")
    new Path(s"$cr/_staged_COMMIT")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
      .create(new Path(s"$cr/_staged_COMMIT"), true).close()
    Similarity.streamIngestPqIndex(spark, dir, cr, col("vec_id") % 5 === 4)
    val want = codesOf(full).filter { case (id, _, _) =>
      id % 5 == 4 || id % 7 != 3 }
    assert(codesOf(cr) == want,
      "ingest after a crashed removal must roll forward, then append")
  }

  test("drift-triggered PQ maintenance: injected drift fires the recall trigger and a refit recovers it") {
    import org.apache.spark.sql.functions.col
    import scala.util.Random
    // two well-separated clusters in R^8: A (all-positive, unit-ish)
    // trains the store; B (all-negative, 5x magnitude — a
    // distribution the quantizer never saw) arrives later through the
    // encode-only append. Queries are B members (vec_id < 5), so
    // their true neighbors are B — exactly the vectors the frozen
    // codebooks encode worst.
    val rnd = new Random(11)
    def vec(center: Double, spread: Double) =
      Seq.fill(8)(center + spread * (rnd.nextDouble() - 0.5)).map(_.toFloat)
    val bRows = (0L until 100L).map(i => (i, vec(-5.0, 1.0), 0L))
    val aRows = (100L until 200L).map(i => (i, vec(1.0, 0.2), 0L))
    def writeDir(rows: Seq[(Long, Seq[Float], Long)]): String = {
      val d = java.nio.file.Files.createTempDirectory("pq_drift").toString
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val dirA = writeDir(aRows)
    val dirAll = writeDir(bRows ++ aRows)
    val store = java.nio.file.Files.createTempDirectory("pq_drift_store").toString
    Similarity.savePqIndex(spark, dirA, store) // trains on A only
    Similarity.appendToPqIndex(spark, dirAll, store, col("vec_id") < 100)
    // gate 0.75: pqAdcRecall holds the re-rank to the strict
    // shortlist (rerank = k), so a healthy refit store measures ~0.78
    // on this fixture — the test grades the TRIGGER mechanics
    // (drift fires, refit recovers, steady state passes), not an
    // absolute fidelity bar the strict measure can't reach
    val (before, retrained, after) =
      Similarity.maintainPqIndex(spark, dirAll, store, minRecall = 0.75)
    assert(retrained, s"drifted store must trigger a refit (recall $before)")
    assert(before < 0.5, s"injected drift should degrade recall, got $before")
    assert(after > before + 0.15 && after > 0.5,
      s"refit must recover recall: before=$before after=$after")
    // steady state: a second maintenance pass measures healthy recall
    // and must NOT retrain again
    val (b2, r2, _) =
      Similarity.maintainPqIndex(spark, dirAll, store, minRecall = 0.75)
    assert(!r2 && b2 >= 0.75, s"post-refit store must pass the gate, got $b2")
  }

  test("ragged codebooks round-trip; a j-gap fails loudly") {
    // save a normal store, then rewrite its codebooks table with the
    // LAST code of subquantizer 0 dropped — the shape k-means produces
    // when a subspace converges with fewer distinct codes — and
    // re-point every code that referenced it at code 0 so the store
    // stays self-consistent (codes never reference a dropped j)
    val store = java.nio.file.Files.createTempDirectory("pq_ragged").toString
    Similarity.savePqIndex(spark, dir, store)
    val cb = spark.read.parquet(s"$store/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val maxJ0 = cb.filter(_._1 == 0).map(_._2).max
    assert(maxJ0 > 0, "fixture needs >1 code in subquantizer 0")
    val ragged = cb.filterNot(r => r._1 == 0 && r._2 == maxJ0)
    ragged.toSeq.toDF("m", "j", "c")
      .write.mode("overwrite").parquet(s"$store/codebooks")
    val codes = spark.read.parquet(s"$store/codes").collect()
      .map { r =>
        val arr = r.getSeq[Int](2).toArray
        if (arr(0) == maxJ0) arr(0) = 0
        (r.getLong(0), r.getInt(1), arr.toSeq)
      }
    codes.toSeq.toDF("vec_id", "cell", "codes")
      .write.mode("overwrite").parquet(s"$store/codes")
    // the ragged store must load and answer (r14 crashed here with
    // ArrayIndexOutOfBoundsException in loadPqArtifacts)
    val out = Similarity.loadedIvfPqTopK(spark, dir, store, nQueries = 3, k = 5)
    assert(out.count() == 15, "ragged store must answer all queries")
    // a NON-prefix gap (j=0 missing while j>0 present) is corruption,
    // not raggedness — the load must fail loudly, not mis-index
    val gapped = cb.filterNot(r => r._1 == 0 && r._2 == 0)
    gapped.toSeq.toDF("m", "j", "c")
      .write.mode("overwrite").parquet(s"$store/codebooks")
    val ex = intercept[IllegalArgumentException] {
      Similarity.loadedIvfPqTopK(spark, dir, store, nQueries = 3, k = 5).count()
    }
    assert(ex.getMessage.contains("corrupt PQ store"), ex.getMessage)
  }

  test("semDedup threshold extremes pin the within-cell keep rule") {
    import org.apache.spark.sql.functions._
    // cos is never > 1 (+ fp slack): nothing may drop
    val none = Similarity.semDedup(spark, dir, threshold = 1.01)
    assert(none.where(col("dropped")).count() == 0)
    // cos >= -1 always holds: everything except each cell's minimum
    // vec_id must drop — the keep rule reduced to its pure form
    val all = Similarity.semDedup(spark, dir, threshold = -1.0)
      .select("vec_id", "cell", "dropped")
      .as[(Long, Long, Boolean)].collect()
    val minPerCell = all.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    all.foreach { case (id, cell, dropped) =>
      assert(dropped == (id != minPerCell(cell)), s"vec $id cell $cell")
    }
  }

  test("PQ removal equals a save of the survivors (frozen artifacts)") {
    import org.apache.spark.sql.functions.col
    val a = java.nio.file.Files.createTempDirectory("pq_rm").toString
    val b = java.nio.file.Files.createTempDirectory("pq_sv").toString
    Similarity.savePqIndex(spark, dir, a)
    Similarity.removeFromPqIndex(spark, a, col("vec_id") % 5 === 1)
    Similarity.savePqIndex(spark, dir, b,
      codesFilter = Some(col("vec_id") % 5 =!= 1))
    val ca = spark.read.parquet(s"$a/codes")
    val cb = spark.read.parquet(s"$b/codes")
    // the codes table after removal is BIT-identical to one saved
    // without the slice — deletion moved no surviving code
    assert(ca.count() == cb.count())
    assert(ca.except(cb).isEmpty && cb.except(ca).isEmpty)
    // and the probes agree row-for-row; no removed id ever surfaces
    val ra = Similarity.loadedIvfPqTopK(spark, dir, a).collect().map(_.toString).toSeq
    val rb = Similarity.loadedIvfPqTopK(spark, dir, b).collect().map(_.toString).toSeq
    assert(ra == rb && ra.nonEmpty)
    assert(Similarity.loadedIvfPqTopK(spark, dir, a)
      .where(col("vec_id") % 5 === 1).isEmpty)
  }

  test("crashed PQ mutation at every window leaves a loadable, correct store") {
    import org.apache.spark.sql.functions.col
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.hadoop.conf.Configuration()
    def fsOf(p: String) = new Path(p).getFileSystem(conf)
    def rows(p: String): Seq[String] =
      Similarity.loadedIvfPqTopK(spark, dir, p).collect().map(_.toString).toSeq

    // the EXPECTED post-removal store (mutation ran to completion)
    val want = java.nio.file.Files.createTempDirectory("pq_want").toString
    Similarity.savePqIndex(spark, dir, want)
    Similarity.removeFromPqIndex(spark, want, col("vec_id") % 7 === 3)
    val wantRows = rows(want)

    // window A: crash BEFORE the marker (staging may be partial) —
    // recovery must roll BACK to the untouched store
    val a = java.nio.file.Files.createTempDirectory("pq_crash_a").toString
    Similarity.savePqIndex(spark, dir, a)
    val before = rows(a)
    spark.read.parquet(s"$a/codes").limit(3)
      .write.parquet(s"$a/_staged/codes") // truncated garbage, no marker
    assert(rows(a) == before, "pre-marker crash must not change answers")
    assert(!fsOf(a).exists(new Path(s"$a/_staged")), "rollback must drop staging")

    // window B: crash AFTER the marker, before any rename — recovery
    // must roll FORWARD to the completed mutation
    val b = java.nio.file.Files.createTempDirectory("pq_crash_b").toString
    Similarity.savePqIndex(spark, dir, b)
    spark.read.parquet(s"$b/codes").where(col("vec_id") % 7 =!= 3)
      .write.parquet(s"$b/_staged/codes")
    fsOf(b).create(new Path(s"$b/_staged_COMMIT"), true).close()
    assert(rows(b) == wantRows, "post-marker crash must complete the mutation")

    // window C: crash MID-swap — live codes renamed aside, staged not
    // yet in place, NO codes directory on disk (the r11-flagged hole)
    val c = java.nio.file.Files.createTempDirectory("pq_crash_c").toString
    Similarity.savePqIndex(spark, dir, c)
    spark.read.parquet(s"$c/codes").where(col("vec_id") % 7 =!= 3)
      .write.parquet(s"$c/_staged/codes")
    val cfs = fsOf(c)
    cfs.create(new Path(s"$c/_staged_COMMIT"), true).close()
    cfs.rename(new Path(s"$c/codes"), new Path(s"$c/codes_old"))
    assert(!cfs.exists(new Path(s"$c/codes")))
    assert(rows(c) == wantRows, "mid-swap crash must complete the mutation")
    assert(!cfs.exists(new Path(s"$c/_staged_COMMIT")))
    assert(!cfs.exists(new Path(s"$c/codes_old")))
  }

  test("drift-triggered compaction: no-op below threshold, refit restores fidelity") {
    val c = java.nio.file.Files.createTempDirectory("pq_drift").toString
    Similarity.savePqIndex(spark, dir, c)
    // a fresh store sits at its own baseline: no refit
    assert(!Similarity.compactPqIndex(spark, dir, c))
    val err0 = Similarity.pqReconstructionError(spark, dir, c)
    // simulate codebook drift: scale+shift the codebooks so the
    // stored codes reconstruct badly (the effect of heavy
    // append/remove traffic shifting the residual distribution)
    val corrupted = spark.read.parquet(s"$c/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).map(x => x * 100 + 50)))
      .toSeq
    corrupted.toDF("m", "j", "c").write.mode("overwrite")
      .parquet(s"$c/codebooks")
    val errDrifted = Similarity.pqReconstructionError(spark, dir, c)
    assert(errDrifted > 2.0 * err0, s"drift setup too weak: $errDrifted vs $err0")
    // over threshold: compaction refits + re-encodes
    assert(Similarity.compactPqIndex(spark, dir, c))
    val errAfter = Similarity.pqReconstructionError(spark, dir, c)
    assert(errAfter < errDrifted / 2, "refit must restore fidelity")
    // baseline was rewritten: an immediate second compaction is a no-op
    assert(!Similarity.compactPqIndex(spark, dir, c))
    // the store still probes
    assert(Similarity.loadedIvfPqTopK(spark, dir, c).count() > 0)
  }
}
