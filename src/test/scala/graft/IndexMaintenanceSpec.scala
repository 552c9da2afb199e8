package graft

import graft.operators.{Dedup, IndexMaintenance}
import graft.sinks.IdempotentMergeSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental index maintenance ≡ from-scratch: the pair table
  * bootstrapped from the base corpus and refreshed with one ingest
  * batch must equal the full-corpus build, with exactly-once merge
  * semantics throughout.
  */
class IndexMaintenanceSpec extends SparkTestBase {

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft_index_maint").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("doc_a", "doc_b", "n_inter", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("bootstrap + one refresh equals the from-scratch build; retry is a no-op") {
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)

    assert(IndexMaintenance.bootstrap(spark, root, base))
    assert(pairSet(IndexMaintenance.pairs(spark, root))
      == pairSet(Dedup.ngramJaccardOf(base)))

    assert(IndexMaintenance.refresh(spark, root, base, batch, "b1"))
    val scratch = pairSet(Dedup.ngramJaccardOf(docs))
    assert(scratch.nonEmpty)
    assert(pairSet(IndexMaintenance.pairs(spark, root)) == scratch,
      "maintained pair table diverges from the from-scratch build")

    // exactly-once: the retried batch changes nothing
    val v = IdempotentMergeSink.version(root)
    assert(!IndexMaintenance.refresh(spark, root, base, batch, "b1"))
    assert(IdempotentMergeSink.version(root) == v)
    assert(pairSet(IndexMaintenance.pairs(spark, root)) == scratch)
  }

  test("labels over the maintained table equal the from-scratch fixpoint") {
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    IndexMaintenance.bootstrap(spark, root, base)
    IndexMaintenance.refresh(spark, root, base, batch, "b1")
    val got = IndexMaintenance.labels(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.connectedComponents(
        Dedup.ngramJaccardOf(docs).select("doc_a", "doc_b"))
      .select("doc_id", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming refresh: two micro-batches converge to the from-scratch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pairsRoot = freshRoot(); val docsRoot = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 > 1)
    graft.operators.IndexMaintenance.bootstrap(spark, pairsRoot, base)
    val b1 = docs.filter(col("doc_id") % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b2 = docs.filter(col("doc_id") % 4 === 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.pairRefreshStream(
      stream.toDF().toDF("doc_id", "text"), pairsRoot, docsRoot, base)
    try {
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(pairSet(IndexMaintenance.pairs(spark, pairsRoot))
      == pairSet(Dedup.ngramJaccardOf(docs)),
      "streamed pair table diverges from the from-scratch build")
    // both micro-batches left their exactly-once record
    assert(IdempotentMergeSink.applied(pairsRoot, "pairs-0"))
    assert(IdempotentMergeSink.applied(pairsRoot, "pairs-1"))
    assert(IdempotentMergeSink.applied(docsRoot, "docs-0"))
    assert(IdempotentMergeSink.applied(docsRoot, "docs-1"))
  }

  test("knn list maintenance: bootstrap + refresh equals the from-scratch mutual-kNN graph") {
    import graft.operators.GraphOps
    val root = freshRoot()
    val nodes = GraphOps.partNodes(spark, sfDir)
    val base = nodes.filter(col("key") % 5 =!= 0)
    val batch = nodes.filter(col("key") % 5 === 0)
    assert(IndexMaintenance.bootstrapKnn(spark, root, base))
    // before the batch, the table equals the base-only build
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(IndexMaintenance.knnEdges(spark, root))
      == edgeSet(GraphOps.mutualEdgesOf(GraphOps.knnListsSymmetric(base))))

    assert(IndexMaintenance.refreshKnn(spark, root, base, batch, "b1"))
    val want = edgeSet(GraphOps.mutualEdgesOf(GraphOps.knnListsSymmetric(nodes)))
    val got = edgeSet(IndexMaintenance.knnEdges(spark, root))
    assert(want.nonEmpty && got == want,
      s"maintained kNN edges diverge: ${got.size} vs ${want.size}; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")

    // eviction really happens: the refresh must be able to REMOVE list
    // rows (mutual-kNN is not additive), so some base-only edge or list
    // row must have disappeared or the test corpus proves nothing
    val baseLists = GraphOps.knnListsSymmetric(base)
    val evicted = baseLists
      .join(IndexMaintenance.knnLists(spark, root), Seq("u", "v"), "left_anti")
    assert(evicted.count() > 0, "batch evicted no list rows — vacuous refresh test")

    // exactly-once + a graph query served from the maintained table
    val v = IdempotentMergeSink.version(root)
    assert(!IndexMaintenance.refreshKnn(spark, root, base, batch, "b1"))
    assert(IdempotentMergeSink.version(root) == v)
    val pr = GraphOps.pagerankOf(IndexMaintenance.knnEdges(spark, root).localCheckpoint())
    assert(pr.count() > 0)
  }

  test("bm25 postings maintenance: inserts + additive df equal from-scratch; scoring reads it") {
    import graft.operators.AnnSearch
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    assert(IndexMaintenance.bootstrapBm25(spark, root, base))
    assert(IndexMaintenance.refreshBm25(spark, root, batch, "b1"))
    val (tf, df, dl) = IndexMaintenance.bm25(spark, root)
    val wantTf = AnnSearch.bm25Tf(docs).localCheckpoint()
    assert(tf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      == wantTf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == wantTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      "additive df counts diverge from the from-scratch term counts")
    // the served scoring leg over the MAINTAINED postings equals the
    // from-scratch leg over the combined corpus
    val wantDl = wantTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val wantDf = wantTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    def ranked(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(ranked(AnnSearch.bm25LexRanked(tf, df, dl))
      == ranked(AnnSearch.bm25LexRanked(wantTf, wantDf, wantDl)))
    // exactly-once across all three sub-tables
    assert(!IndexMaintenance.refreshBm25(spark, root, batch, "b1"))
  }

  test("two RACING bm25 refreshers converge to the from-scratch postings") {
    import graft.operators.AnnSearch
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 > 1)
    val b1 = docs.filter(col("doc_id") % 4 === 0)
    val b2 = docs.filter(col("doc_id") % 4 === 1)
    assert(IndexMaintenance.bootstrapBm25(spark, root, base))
    // the lost-update shape the additive merge retires: both refreshers
    // read the bootstrap df, commit concurrently — with the old
    // read-modify-write upsert the CAS loser re-committed absolutes
    // computed against the stale read and dropped the winner's counts
    val results = Await.result(Future.sequence(Seq(
      Future(IndexMaintenance.refreshBm25(spark, root, b1, "race-b1")),
      Future(IndexMaintenance.refreshBm25(spark, root, b2, "race-b2")))),
      5.minutes)
    assert(results == Seq(true, true))
    val (_, df, _) = IndexMaintenance.bm25(spark, root)
    val wantDf = AnnSearch.bm25Tf(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == wantDf.collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      "racing df refreshers lost an increment")
  }

  test("dct phash maintenance: additive fingerprints and pairs equal from-scratch") {
    import graft.operators.Multimodal
    val root = freshRoot()
    val media = Multimodal.augmentedMedia(spark, sfDir)
    val base = media.filter(col("doc_id") % 3 =!= 0)
    val batch = media.filter(col("doc_id") % 3 === 0)
    assert(IndexMaintenance.bootstrapPhash(spark, root, base))
    assert(IndexMaintenance.refreshPhash(spark, root, batch, "b1"))
    def pairSet4(df: org.apache.spark.sql.DataFrame) =
      df.select("modality", "doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = pairSet4(
      Multimodal.dctPairsOver(Multimodal.dctFingerprintsOf(media).localCheckpoint()))
    val got = pairSet4(IndexMaintenance.dctPairs(spark, root))
    assert(want.nonEmpty && got == want,
      s"maintained dct pairs diverge: ${got.size} vs ${want.size}")
    // the batch introduced pairs (re-encode variants land in it), so
    // the refresh path is non-vacuous
    assert(pairSet4(IndexMaintenance.dctPairs(spark, root)).size
      > pairSet4(Multimodal.dctPairsOver(
        Multimodal.dctFingerprintsOf(base).localCheckpoint())).size)
    // exactly-once
    assert(!IndexMaintenance.refreshPhash(spark, root, batch, "b1"))
  }

  test("streaming bm25/knn/phash refresh twins converge to the from-scratch builds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{AnnSearch, GraphOps, Multimodal}

    // BM25: two micro-batches of new docs over a bootstrapped base
    val bmRoot = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 > 1)
    IndexMaintenance.bootstrapBm25(spark, bmRoot, base)
    val bmStream = MemoryStream[(Long, String)]
    val bmQ = graft.streaming.StreamOps.bm25RefreshStream(
      bmStream.toDF().toDF("doc_id", "text"), bmRoot)
    try {
      bmStream.addData(docs.filter(col("doc_id") % 4 === 0)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      bmQ.processAllAvailable()
      bmStream.addData(docs.filter(col("doc_id") % 4 === 1)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      bmQ.processAllAvailable()
    } finally bmQ.stop()
    val (tf, df, _) = IndexMaintenance.bm25(spark, bmRoot)
    val wantTf = AnnSearch.bm25Tf(docs).localCheckpoint()
    assert(tf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      == wantTf.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == wantTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(IdempotentMergeSink.applied(s"$bmRoot/tf", "bm25-0")
      && IdempotentMergeSink.applied(s"$bmRoot/df", "bm25-1"))

    // kNN: one micro-batch of new nodes
    val listsRoot = freshRoot(); val nodesRoot = freshRoot()
    val nodes = GraphOps.partNodes(spark, sfDir)
    val nodeBase = nodes.filter(col("key") % 5 =!= 0)
    IndexMaintenance.bootstrapKnn(spark, listsRoot, nodeBase)
    val knStream = MemoryStream[(Long, Double)]
    val knQ = graft.streaming.StreamOps.knnRefreshStream(
      knStream.toDF().toDF("key", "price"), listsRoot, nodesRoot, nodeBase)
    try {
      knStream.addData(nodes.filter(col("key") % 5 === 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
      knQ.processAllAvailable()
    } finally knQ.stop()
    val gotEdges = IndexMaintenance.knnEdges(spark, listsRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantEdges = GraphOps.mutualEdgesOf(GraphOps.knnListsSymmetric(nodes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wantEdges.nonEmpty && gotEdges == wantEdges)

    // phash: one micro-batch of media rows
    val phRoot = freshRoot()
    val media = Multimodal.augmentedMedia(spark, sfDir)
    val mBase = media.filter(col("doc_id") % 3 =!= 0)
    IndexMaintenance.bootstrapPhash(spark, phRoot, mBase)
    val phStream = MemoryStream[(Long, Array[Byte], String)]
    val phQ = graft.streaming.StreamOps.phashRefreshStream(
      phStream.toDF().toDF("doc_id", "payload", "modality"), phRoot)
    try {
      phStream.addData(media.filter(col("doc_id") % 3 === 0)
        .collect().map(m => (m.doc_id, m.payload, m.modality)).toSeq)
      phQ.processAllAvailable()
    } finally phQ.stop()
    val gotPairs = IndexMaintenance.dctPairs(spark, phRoot)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val wantPairs = Multimodal.dctPairsOver(
        Multimodal.dctFingerprintsOf(media).localCheckpoint())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(wantPairs.nonEmpty && gotPairs == wantPairs)
  }

  test("span gram maintenance: inserts + additive df equal from-scratch; cap crossing retracts pairs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    def spanSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    // real corpus: bootstrap on 3/4, refresh the rest, equals from-scratch
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    assert(IndexMaintenance.bootstrapSpans(spark, root, base))
    assert(spanSet(IndexMaintenance.exactSpans(spark, root))
      == spanSet(TextAnalysis.exactSpansOver(base)))
    assert(IndexMaintenance.refreshSpans(spark, root, batch, "b1"))
    val scratch = spanSet(TextAnalysis.exactSpansOver(docs))
    assert(scratch.nonEmpty)
    assert(spanSet(IndexMaintenance.exactSpans(spark, root)) == scratch,
      "maintained span extraction diverges from the from-scratch build")
    // exactly-once: the retried batch changes nothing
    assert(!IndexMaintenance.refreshSpans(spark, root, batch, "b1"))
    assert(spanSet(IndexMaintenance.exactSpans(spark, root)) == scratch)

    // cap crossing: a phrase in 49 base docs is under the df cap and
    // pairs freely; a 2-doc batch pushes its df to 51 — the maintained
    // df retroactively disqualifies the gram and ALL its pairs vanish
    // (the non-additive case that forces recompute-over-maintained)
    val root2 = freshRoot()
    val boiler = "c1 c2 c3 c4 c5"
    val base2 = (1L to 49L).map(i => (i, s"x$i $boiler y$i")).toDF("doc_id", "text")
    val batch2 = Seq((50L, s"x50 $boiler y50"), (51L, s"x51 $boiler y51"))
      .toDF("doc_id", "text")
    assert(IndexMaintenance.bootstrapSpans(spark, root2, base2))
    assert(IndexMaintenance.exactSpans(spark, root2).count() == 49L * 48 / 2)
    assert(IndexMaintenance.refreshSpans(spark, root2, batch2, "cap"))
    assert(IndexMaintenance.exactSpans(spark, root2).count() == 0,
      "over-cap boilerplate pairs survived the df crossing")
    assert(spanSet(IndexMaintenance.exactSpans(spark, root2))
      == spanSet(TextAnalysis.exactSpansOver(base2.union(batch2))))
  }

  test("streaming span refresh twin converges to the from-scratch extraction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextAnalysis

    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 > 1)
    IndexMaintenance.bootstrapSpans(spark, root, base)
    val st = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.spanRefreshStream(
      st.toDF().toDF("doc_id", "text"), root)
    try {
      st.addData(docs.filter(col("doc_id") % 4 === 0)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
      st.addData(docs.filter(col("doc_id") % 4 === 1)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = IndexMaintenance.exactSpans(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val want = TextAnalysis.exactSpansOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty && got == want)
    assert(IdempotentMergeSink.applied(s"$root/grams", "spans-0")
      && IdempotentMergeSink.applied(s"$root/gdf", "spans-1"))
  }

  test("a second batch composes: two refreshes equal one combined build") {
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 4 > 1)       // ids 2,3 mod 4
    val b1 = docs.filter(col("doc_id") % 4 === 0)
    val b2 = docs.filter(col("doc_id") % 4 === 1)
    IndexMaintenance.bootstrap(spark, root, base)
    assert(IndexMaintenance.refresh(spark, root, base, b1, "b1"))
    // the second batch probes base ∪ b1 — the already-ingested corpus
    assert(IndexMaintenance.refresh(spark, root, base.union(b1), b2, "b2"))
    assert(pairSet(IndexMaintenance.pairs(spark, root))
      == pairSet(Dedup.ngramJaccardOf(docs)))
  }
}
