package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B: wedge-pair counting via self-join vs basket
  * expansion over the q_g_link_jaccard co-occurrence graph. */
object ProfWedge {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("v")),
        Seq("l_orderkey"))
      .filter(col("u") < col("v"))
    val e = graft.operators.Graph
      .cappedCanonicalEdges(pairs, "u", "v", 128)
      .localCheckpoint(eager = true)
    println("edges: " + e.count())
    val adj = e.select(col("u").as("n"), col("v").as("w"))
      .unionAll(e.select(col("v").as("n"), col("u").as("w")))
      .localCheckpoint(eager = true)
    println("adj: " + adj.count())
    def joinForm() = adj.select(col("n").as("a"), col("w"))
      .join(adj.select(col("n").as("b"), col("w")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    def basketForm() = adj.groupBy("w")
      .agg(collect_list(col("n")).as("ns"))
      .select(col("ns"), explode(col("ns")).as("a"))
      .select(col("a"),
        explode(expr("filter(ns, x -> x > a)")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    for (i <- 1 to 3) {
      t(s"A-join-$i") { joinForm()
        .write.format("noop").mode("overwrite").save() }
      t(s"B-basket-$i") { basketForm()
        .write.format("noop").mode("overwrite").save() }
    }
    s.stop()
  }
}
