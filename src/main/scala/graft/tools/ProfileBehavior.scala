package graft.tools

import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.{Behavior, Similarity, TextAnalysis, Triangles}

/** Scale probe for the round-15 behavioral/graph/selection tranche —
  * weeklyRetention + funnel (user-salted events: factor× users, same
  * per-user history shape), Triangles.perNode (factor disjoint graph
  * copies: m grows factor×, degree structure per copy preserved),
  * ngramNovelty (factor× candidates vs a FIXED reference), and
  * positivePairs (factor× corpus vs fixed anchors):
  * `sbt "runMain graft.tools.ProfileBehavior <sfDir> <factor>"`,
  * two timed runs each at 1x and factor-x (run 2 is the warmed number).
  */
object ProfileBehavior {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 20
    // optional: shuffle-partition override and stage filter (tri-only)
    val parts = if (args.length > 2) Some(args(2).toInt) else None
    val triOnly = args.length > 3 && args(3) == "tri"
    val scratchBase = s"${System.getProperty("java.io.tmpdir")}/graft_profbeh"
    val spark = Engine.session()
    spark.conf.set("spark.graft.scratchDir", scratchBase)
    parts.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def mat(df: org.apache.spark.sql.DataFrame, name: String) = {
      val dir = s"$scratchBase/$name"
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    val events = Engine.table(spark, sfDir, "events")
      .select("user_id", "ts", "event_type")
    val bigEvents = mat((0 until factor).map { k =>
      events.select((col("user_id") + lit(k * 10000000L)).as("user_id"),
        col("ts"), col("event_type"))
    }.reduce(_ union _), "events")

    val edges = Engine.table(spark, sfDir, "lineitem").select(
        ((col("l_orderkey") * 7 + 1) % 100003).as("x"),
        ((col("l_partkey") * 13 + 5) % 100003).as("y"),
        ((col("l_suppkey") * 31 + 11) % 100003).as("z"))
      .select(explode(array(
        struct(col("x").as("u"), col("y").as("v")),
        struct(col("y").as("u"), col("z").as("v")),
        struct(col("z").as("u"), col("x").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val bigEdges = mat((0 until factor).map { k =>
      edges.select((col("u") + lit(k * 200003L)).as("u"),
        (col("v") + lit(k * 200003L)).as("v"))
    }.reduce(_ union _), "edges")

    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "text")
    val reference = docs.filter(col("doc_id") >= 100)
    val cand = docs.filter(col("doc_id") < 100)
    val off = docs.agg(max("doc_id")).head().getLong(0) + 1
    val bigCand = mat((0 until factor).map { k =>
      cand.select((col("doc_id") + lit(k * off)).as("doc_id"),
        graft.operators.SparkCols.regexpReplaceAll(col("text"), "\\s+", s" n${k}q ").as("text"))
    }.reduce(_ union _), "cand")

    val emb = Engine.table(spark, sfDir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 5)
    val bigEmb = mat((0 until factor).map { k =>
      emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ union _), "emb")

    println(s"[beh] events ${bigEvents.count()}, edges ${bigEdges.count()}, " +
      s"cand ${bigCand.count()}, emb ${bigEmb.count()} (${factor}x)")

    for (run <- 1 to 2;
         (label, ev, ed, cd, em) <- Seq(
           ("1x", events, edges, cand, emb),
           (s"${factor}x", bigEvents, bigEdges, bigCand, bigEmb))) {
      if (triOnly) {
        val t2 = System.nanoTime()
        val nt = Triangles.perNode(ed).count()
        val tt = (System.nanoTime() - t2) / 1e9
        println(f"[beh] $label%4s run$run triangles $tt%6.2f s ($nt)")
      } else {
      val t0 = System.nanoTime()
      val nr = Behavior.weeklyRetention(ev).count()
      val tr = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nf = Behavior.funnel(ev, Seq("signup", "view", "purchase"), 30)
        .agg(sum("n_users")).head().getLong(0)
      val tf = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nt = Triangles.perNode(ed).count()
      val tt = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val nn = TextAnalysis.ngramNovelty(cd, reference).count()
      val tn = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val np = Similarity.positivePairs(em, anchors, k = 10).count()
      val tp = (System.nanoTime() - t4) / 1e9
      println(f"[beh] $label%4s run$run retention $tr%6.2f s ($nr) " +
        f"funnel $tf%6.2f s ($nf) triangles $tt%6.2f s ($nt) " +
        f"novelty $tn%6.2f s ($nn) pospairs $tp%6.2f s ($np)")
      }
    }
    spark.stop()
  }
}
