package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for the Graph queries. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val eJoin = time("edges_selfjoin") {
      op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("pa"), col("b.p").as("pb"))
        .distinct().localCheckpoint()
    }
    println("EDGES_JOIN " + eJoin.count())
    val e = time("edges_collect") {
      li.groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y ->
            |    struct(x AS pa, y AS pb))))""".stripMargin)).as("pr"))
        .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .distinct().localCheckpoint()
    }
    println("EDGES " + e.count())
    val deg = e.select(col("pa").as("v")).union(e.select(col("pb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val o2 = time("orient") {
      e.join(deg.withColumnRenamed("v", "pa").withColumnRenamed("deg", "da"), "pa")
        .join(deg.withColumnRenamed("v", "pb").withColumnRenamed("deg", "db"), "pb")
        .select(
          when(col("da") < col("db") ||
               (col("da") === col("db") && col("pa") < col("pb")),
            struct(col("pa").as("src"), col("pb").as("dst"), col("db").as("ddst")))
            .otherwise(
              struct(col("pb").as("src"), col("pa").as("dst"), col("da").as("ddst")))
            .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.ddst").as("ddst"))
        .localCheckpoint()
    }
    val wedgeCount = time("wedges+close+agg") {
      val wedges = o2.as("x").join(broadcast(o2).as("y"),
          col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
        .select(col("x.src").as("a"), col("x.dst").as("lo"), col("y.dst").as("hi"))
      wedges.join(broadcast(o2.select(col("src").as("lo"), col("dst").as("hi"))),
          Seq("lo", "hi"))
        .select(explode(array(col("a"), col("lo"), col("hi"))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
        .count()
    }
    println("TRI_NODES " + wedgeCount)
    // packed-key variant: rank rk = ddst<<25 | dst (one long compare),
    // closing edge key = src<<25 | dst (LongHashedRelation probe)
    val o3 = time("orient_packed") {
      o2.select(col("src"), col("dst"),
          (shiftleft(col("ddst"), 25) + col("dst")).as("rk"))
        .localCheckpoint()
    }
    val packedCount = time("wedges_packed") {
      val wedges = o3.as("x").join(broadcast(o3).as("y"),
          col("x.src") === col("y.src") && col("x.rk") < col("y.rk"))
        .select(col("x.src").as("a"), col("x.dst").as("lo"), col("y.dst").as("hi"),
          (shiftleft(col("x.dst"), 25) + col("y.dst")).as("ekey"))
      wedges.join(
          broadcast(o3.select((shiftleft(col("src"), 25) + col("dst")).as("ekey"))),
          Seq("ekey"))
        .select(explode(array(col("a"), col("lo"), col("hi"))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
        .count()
    }
    println("TRI_NODES_PACKED " + packedCount)
    spark.stop()
  }
}
