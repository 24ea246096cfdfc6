package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Engine
import graft.operators.Triangles

/** Stage-level timing for the triangle-count plan at a given SF:
  * `sbt "runMain graft.tools.ProfileTriangles <sfDir>"`.
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def tm(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[tri] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    def edges = Engine.table(spark, sfDir, "lineitem").select(
        ((col("l_orderkey") * 7 + 1) % 100003).as("x"),
        ((col("l_partkey") * 13 + 5) % 100003).as("y"),
        ((col("l_suppkey") * 31 + 11) % 100003).as("z"))
      .select(explode(array(
        struct(col("x").as("u"), col("y").as("v")),
        struct(col("y").as("u"), col("z").as("v")),
        struct(col("z").as("u"), col("x").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

    def e = edges.select(least(col("u"), col("v")).cast("long").as("a"),
        greatest(col("u"), col("v")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    def deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .select(col("n"), (shiftleft(col("d"), 31) + col("n")).as("rank"))
    def ranked = e
      .join(deg.select(col("n").as("a"), col("rank").as("ra")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("rank").as("rb")), Seq("b"))
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("src"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("dst"))

    tm("edges")(edges.select(count(lit(1))))
    tm("edges-distinct")(e.select(count(lit(1))))
    tm("deg")(deg.select(count(lit(1))))
    tm("oriented")(ranked.select(count(lit(1))))
    tm("full")(Triangles.perNode(edges))
    tm("full-again")(Triangles.perNode(edges))
    spark.stop()
  }
}
