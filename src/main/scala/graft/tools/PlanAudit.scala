package graft.tools

/** Plan-quality audit over the whole query inventory: for each query,
  * inspect the optimized/physical plan for the scale signals the
  * engine is designed around — filter pushdown reaching scans, column
  * pruning, broadcast vs shuffle join selection, single-partition
  * windows. Prints one line per query + a summary of violations. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val phys = df.queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(phys).length
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(phys).length
        val bhj = "BroadcastHashJoin".r.findAllIn(phys).length
        val smj = "SortMergeJoin".r.findAllIn(phys).length
        val bnl = "BroadcastNestedLoopJoin\\b".r.findAllIn(phys).length
        val cartesian = "CartesianProduct".r.findAllIn(phys).length
        val wholeCodegen = "WholeStageCodegen".r.findAllIn(phys).length
        // Ordered window with an empty partition spec = every row through
        // one task at scale. In the analyzed plan such a spec prints as
        // windowspecdefinition(<sortcol> ASC|DESC NULLS ..., frame) — the
        // FIRST argument is already a sort order, meaning zero partition
        // expressions precede it.
        val globalWindow = {
          val analyzed = df.queryExecution.analyzed.toString
          "windowspecdefinition\\(([^,]*)".r.findAllMatchIn(analyzed)
            .exists(m => m.group(1).contains(" ASC NULLS") ||
              m.group(1).contains(" DESC NULLS"))
        }
        // Fact-table broadcast (r17): Catalyst's compile-time size
        // estimate can put a narrow PROJECTION of a fact table under
        // the broadcast threshold, producing a driver-built hashed
        // relation of the whole fact — slow locally (single-threaded
        // build) and an OOM at any real scale. Flag a broadcast join
        // whose BUILD SIDE scans a fact fixture with NO aggregate or
        // join between the scan and the broadcast (a reduced/joined
        // subset, e.g. q18's >300-qty survivors, is legitimately tiny).
        //
        // r17 session 2 fix: the first version of this detector matched
        // BroadcastExchangeExec in `queryExecution.sparkPlan` — but
        // exchanges are inserted by EnsureRequirements, a PREPARATION
        // rule that only runs for executedPlan (where AQE then hides
        // the tree behind a childless AdaptiveSparkPlanExec). The
        // detector therefore never fired on anything and its "0
        // flagged" was vacuous — sql_tpch_q4's LeftSemi broadcast of
        // the full projected lineitem sailed through. Walk the
        // broadcast JOIN's declared build side instead: join nodes DO
        // exist in sparkPlan, and buildSide names the subtree that
        // EnsureRequirements will wrap in a BroadcastExchange.
        val factBroadcast = {
          val facts = Seq("lineitem", "events.parquet", "documents")
          def nodes(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.SparkPlan] =
            p +: p.children.flatMap(nodes)
          def flaggedBuild(
              build: org.apache.spark.sql.execution.SparkPlan): Boolean = {
            val sub = nodes(build)
            val scansFact = sub.exists {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                facts.exists(t => f.relation.location.rootPaths
                  .exists(_.toString.contains(t)))
              case _ => false
            }
            val reduced = sub.exists {
              case _: org.apache.spark.sql.execution.aggregate
                  .BaseAggregateExec => true
              case _: org.apache.spark.sql.execution.joins
                  .BaseJoinExec => true
              case _ => false
            }
            scansFact && !reduced
          }
          nodes(df.queryExecution.sparkPlan).exists {
            case b: org.apache.spark.sql.execution.joins
                .BroadcastHashJoinExec =>
              flaggedBuild(b.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                  b.left
                case _ => b.right
              })
            case b: org.apache.spark.sql.execution.joins
                .BroadcastNestedLoopJoinExec =>
              flaggedBuild(b.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                  b.left
                case _ => b.right
              })
            case _ => false
          }
        }
        val flags = Seq(
          if (cartesian > 0) Some("CARTESIAN") else None,
          if (globalWindow) Some("GLOBAL_WINDOW") else None,
          if (factBroadcast) Some("FACT_BROADCAST") else None,
          // full-width scan: ReadSchema listing every column of lineitem
          if (phys.contains("ReadSchema: struct<l_orderkey") &&
            phys.contains("l_comment")) Some("WIDE_SCAN") else None
        ).flatten
        if (flags.nonEmpty) flagged += 1
        println(f"$name%-32s scans=$scans pushed=$pushed bhj=$bhj " +
          f"smj=$smj bnl=$bnl codegen=$wholeCodegen ${flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(f"$name%-32s PLAN_FAIL ${e.getMessage.take(80)}")
        flagged += 1
      }
    }
    println(s"AUDIT_FLAGGED=$flagged")
    spark.stop()
  }
}
