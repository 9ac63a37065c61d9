package graft

/** Registry-wide invariants over the ENTIRE driver surface — blanket
  * guarantees the per-query specs can't keep up with as the surface
  * grows. */
class RegistrySpec extends SparkSpec {

  /** Streaming replays and sink round-trips EXECUTE work while the
    * query builder runs (processAllAvailable inside), so they are
    * excluded from plan-only sweeps; their operators' batch twins are
    * all swept below, and their own specs cover them. */
  private val executesOnBuild = Set(
    "x19_stream_tumbling", "x44_stream_sessions",
    "x54_stream_sessions_stateful", "x57_stream_view_purchase",
    "x68_stream_dedup", "x72_stream_curation", "x82_stream_top_types",
    "x91_stream_idempotent_sink", "x105_stream_incremental_agg",
    // iterative: label propagation runs jobs to converge
    "x43_dup_clusters", "x96_dedup_canonical", "x104_cluster_source_matrix",
    // k-means iterations run during planning of the final frame
    "x28_sim_topk_ivf",
    // builds + appends the persisted IVF index (manifest writes) on build
    "x154_ivf_index_lifecycle")

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => executesOnBuild(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: ${offenders.mkString(", ")}")
  }

  test("no query plans an unpartitioned window over a corpus-derived frame") {
    // The single-task global sort is the canonical 100 TB scale-killer:
    // `Window.orderBy(…)` with no partitionBy funnels its whole input
    // through ONE partition. Bounded control frames legitimately do this
    // (budgetFill's ≤1001-row quality histogram, GlobalOrder's
    // per-bucket offsets) — and every such frame is a grouped rollup,
    // so the guard: an unpartitioned logical Window is allowed ONLY
    // when its child subtree contains a grouped Aggregate (frame size =
    // group-key cardinality, not corpus rows). A window straight over a
    // scan/join/explode — the r15 budgetFill boundary bucket, the old
    // DataGen item_id — fails here by name.
    // Two independent teeth, both must bite:
    //  STRUCTURE — walking DOWN the window's direct child chain
    //    through row-non-increasing unary nodes (project/filter/sort/
    //    repartition/window), the frame must terminate in a Limit or
    //    a grouped Aggregate rollup BEFORE any join/scan/generate. A
    //    "contains an Aggregate somewhere in the subtree" test is too
    //    loose: the r15 budgetFill boundary bucket was corpus rows
    //    crossJoined with a 1-row aggregate — an aggregate in the
    //    tree, corpus rows through the window (seeded back in r17 to
    //    prove this guard fires on it; it does, by name).
    //  SIZE — the child frame, EXECUTED, must hold at most
    //    MaxControlFrameRows rows: pins every whitelisted rollup to
    //    its documented cardinality (budgetFill's ≤1001-row quality
    //    histogram, GlobalOrder's per-bucket offsets, x149's 200-row
    //    top-k re-rank) so a rollup on an unbounded key (groupBy
    //    doc_id) can't hide behind the structure tooth.
    import org.apache.spark.sql.catalyst.plans.logical._
    val MaxControlFrameRows = 4096L
    def boundedByConstruction(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate => a.groupingExpressions.nonEmpty
      case n @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias |
                _: Window | _: Deduplicate) =>
        boundedByConstruction(n.children.head)
      case r: RepartitionOperation => boundedByConstruction(r.child)
      // a join of two control frames stays a control frame (x49 joins
      // two day-keyed rollups); a corpus side on EITHER input taints
      // it — the r15 boundary bucket was corpus × 1-row-aggregate
      case j: Join =>
        boundedByConstruction(j.left) && boundedByConstruction(j.right)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => executesOnBuild(name) }
      .flatMap { case (name, fn) =>
        val wins = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        wins.flatMap { w =>
          if (!boundedByConstruction(w.child))
            Some(s"$name (unpartitioned window over a non-control frame)")
          else {
            val n = org.apache.spark.sql.GraftPlanExec
              .ofRows(spark, w.child).count()
            if (n > MaxControlFrameRows)
              Some(s"$name (unpartitioned window over $n rows > $MaxControlFrameRows)")
            else None
          }
        }
      }
    assert(offenders.isEmpty,
      s"unpartitioned window over a non-control frame in: ${offenders.mkString(", ")}")
  }

  test("every query has an oracle except the documented rows-only set") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"orphan oracles: ${(oracles -- queries).mkString(", ")}")
    val rowsOnly = queries -- oracles
    assert(rowsOnly.isEmpty,
      s"undocumented rows-only queries: ${rowsOnly.mkString(", ")}")
  }

  test("query and oracle column names agree (the driver compares by sorted name)") {
    // spot the mismatch class that silently fails the hash gate: run the
    // cheap plan-only column extraction for every oracle-gated query
    val mismatched = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => executesOnBuild(name) }
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .flatMap { case (name, fn) =>
        val sparkCols = fn(spark, sfDir).columns.toSet
        // oracle columns are authoritative only via DuckDB; here assert
        // the spark side has no duplicate or empty column names, which
        // the sorted-name compare cannot survive
        val dups = fn(spark, sfDir).columns.groupBy(identity).filter(_._2.length > 1).keys
        if (dups.nonEmpty || sparkCols.contains("")) Some(name -> dups.mkString(","))
        else None
      }
    assert(mismatched.isEmpty, s"ambiguous output columns: $mismatched")
  }
}
