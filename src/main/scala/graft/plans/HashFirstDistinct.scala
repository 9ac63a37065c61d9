package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Md5, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** The repo's hash-first contract, installed as a Catalyst optimizer
  * rule: `COUNT(DISTINCT <string>)` rewrites to
  * `COUNT(DISTINCT xxhash64(s), md5(s))`, so the distinct exchange
  * carries a 24-byte key pair instead of the full string payload. On a
  * document corpus this is the difference between shuffling kilobyte
  * texts and shuffling fixed 24-byte keys — the same identity contract
  * exactDedup (x01) documents, applied automatically to every
  * hand-written `count_distinct` that would otherwise ship payloads.
  *
  * Exactness bound: two distinct strings colliding in BOTH hashes is
  * p ≈ 2^-192 per pair — the content-addressable-store identity
  * contract, stated once at Dedup.exactDedup and inherited here.
  * NULL semantics are preserved: a NULL string hashes to NULL in both
  * columns and multi-arg COUNT skips rows with any NULL, exactly as
  * single-arg COUNT DISTINCT skips NULL.
  *
  * Scope guards: only single-argument string COUNT DISTINCT inside an
  * [[Aggregate]] (window aggregates don't support distinct), only
  * deterministic arguments. The rewritten node has two children, so
  * the fixed-point optimizer batch can't match it twice. Proven
  * end-to-end by the driver gate: x02/x26 run `count(distinct text)`
  * through this rule and still hash-match DuckDB's un-rewritten
  * COUNT(DISTINCT text).
  *
  * Opt-out: `SET spark.graft.hashFirstDistinct.enabled=false` disables
  * the rewrite per session — default ON (the driver and every registry
  * query run with it), but an ad-hoc session doing forensic exact
  * counting can decline the 2^-192 probabilistic identity without
  * dropping the whole extension. Read per-apply from the session's
  * SQLConf, so a `SET` takes effect on the next query, no restart.
  */
object HashFirstDistinctRule extends Rule[LogicalPlan] {
  val EnabledKey = "spark.graft.hashFirstDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(Count(Seq(e)), _, true, _, _)
            if e.dataType == StringType && e.deterministic =>
          // seed 42L = the xxhash64() SQL function's default seed; the
          // explicit binary cast is what the analyzer would have
          // inserted for md5 — optimizer rules run post-analysis, so
          // implicit casts must be spelled out or the plan unresolves
          ae.copy(aggregateFunction = Count(Seq(
            XxHash64(Seq(e), 42L),
            Md5(Cast(e, org.apache.spark.sql.types.BinaryType)))))
      }
  }
}
