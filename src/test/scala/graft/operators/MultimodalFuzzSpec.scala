package graft.operators

import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Seeded fuzz of the multimodal decode surface (the TvfArgumentFuzzSpec
  * pattern): round 10's review found two INFINITE LOOPS (truncated-IDAT
  * inflate, negative RIFF chunk size) and a crash that correctness runs
  * could never see, and fixed them — this spec is what stops them
  * regressing. Every buffer — random garbage, truncations, bit flips,
  * valid-magic prefixes on garbage tails, appended tails — must come
  * back from [[Multimodal.decodeOne]] as a ROW (a real format, "unknown",
  * or "error") within a wall-clock guard: never a hang, never an escaped
  * exception (the dispatcher's crawl-safety contract), never a fatal
  * error. Seeded: the pinned default keeps CI deterministic, and
  * GRAFT_FUZZ_SEED reseeds for deeper local shakes (failure messages
  * carry seed + iteration).
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260813L)

  /** One well-formed asset per format, from the same synthesizers the
    * declared queries use — the mutation seeds.
    */
  private lazy val validAssets: IndexedSeq[Array[Byte]] = {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox"), (1L, "jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    (Multimodal.synthesizeWav(spark, docs).collect().map(_.wav) ++
      Multimodal.synthesizeBmp(spark, docs).collect().map(_.bmp) ++
      Multimodal.synthesizeY4m(spark, docs).collect().map(_.y4m) ++
      Multimodal.synthesizePng(spark, docs).collect().map(_.png) ++
      Multimodal.synthesizeGif(spark, docs).collect().map(_.gif)).toIndexedSeq
  }

  /** Container magics the sniffing dispatcher routes on — prepended to
    * garbage so every PARSER (not just the dispatch) eats hostile bytes.
    */
  private def magicPrefixes(rnd: scala.util.Random): Seq[Array[Byte]] = Seq(
    "RIFF".getBytes("US-ASCII") ++ Array.fill(4)(rnd.nextInt.toByte) ++
      "WAVE".getBytes("US-ASCII"),
    Array(0x89.toByte) ++ "PNG".getBytes("US-ASCII") ++
      Array[Byte](0x0d, 0x0a, 0x1a, 0x0a),
    "GIF89a".getBytes("US-ASCII"),
    "GIF87a".getBytes("US-ASCII"),
    "YUV4MPEG2".getBytes("US-ASCII"),
    "BM".getBytes("US-ASCII"))

  private def fuzzBuffer(rnd: scala.util.Random): Array[Byte] = {
    def randomBytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    def pick(): Array[Byte] = validAssets(rnd.nextInt(validAssets.length))
    rnd.nextInt(6) match {
      case 0 => randomBytes(rnd.nextInt(2048))
      case 1 => // truncation — the round-10 hangs were truncated streams
        val v = pick(); java.util.Arrays.copyOf(v, rnd.nextInt(v.length + 1))
      case 2 => // bit flips — corrupt lengths/counts inside a valid frame
        val v = pick().clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          val i = rnd.nextInt(v.length)
          v(i) = (v(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        v
      case 3 => // a real magic on a garbage body
        val m = magicPrefixes(rnd)
        m(rnd.nextInt(m.length)) ++ randomBytes(rnd.nextInt(512))
      case 4 => pick() ++ randomBytes(1 + rnd.nextInt(64)) // trailing junk
      case _ => randomBytes(rnd.nextInt(4)) // empty/tiny
    }
  }

  private val formats = Set("wav", "png", "gif", "y4m", "bmp", "unknown", "error")

  test("decodeOne terminates with a row on 600 hostile buffers (seeded, wall-clock guard)") {
    val rnd = new scala.util.Random(seed)
    val exec = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "fuzz-decode"); t.setDaemon(true); t
    }
    try {
      (0 until 600).foreach { i =>
        val buf = fuzzBuffer(rnd)
        val fut = exec.submit(new Callable[Multimodal.AssetFeature] {
          override def call(): Multimodal.AssetFeature = Multimodal.decodeOne(i.toLong, buf)
        })
        val row =
          try fut.get(10, TimeUnit.SECONDS)
          catch {
            case _: TimeoutException =>
              fut.cancel(true)
              fail(s"decodeOne HUNG >10s on iteration $i (seed=$seed, " +
                s"len=${buf.length}, head=${buf.take(16).map(b => f"$b%02x").mkString})")
            case e: java.util.concurrent.ExecutionException =>
              fail(s"decodeOne threw through the containment on iteration $i " +
                s"(seed=$seed, len=${buf.length}): ${e.getCause}")
          }
        assert(row.asset_id == i.toLong)
        assert(row.size_bytes == buf.length.toLong)
        assert(formats(row.format),
          s"unexpected format '${row.format}' on iteration $i (seed=$seed)")
      }
    } finally { exec.shutdownNow(); () }
  }

  test("decodeFeatures survives the same hostile corpus distributed, one row per asset") {
    import spark.implicits._
    val rnd = new scala.util.Random(seed + 1)
    val assets = (0 until 200).map(i => (i.toLong, fuzzBuffer(rnd)))
    val out = Multimodal.decodeFeatures(spark,
      assets.toDF("asset_id", "bytes")).collect()
    assert(out.length == 200)
    assert(out.forall(f => formats(f.format)))
    // Error containment really is per-asset: planted garbage rows must
    // not have taken healthy neighbors down with them.
    assert(out.map(_.asset_id).toSet == (0L until 200L).toSet)
  }
}
