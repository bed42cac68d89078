package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Cluster-grade registration of graft's Catalyst additions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the native as-of planner strategy into EVERY session of the
  * application at build time — the production alternative to the lazy
  * per-session `experimental.extraStrategies` registration that
  * [[graft.plans.AsOfJoinNative.joinBackward]] performs for ad-hoc
  * sessions (both paths stay: the lazy one keeps notebooks and tests
  * zero-config, this one is for clusters where the config ships with
  * the job). SparkSessionExtensions is the supported, stable hook —
  * no Spark internals are touched. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinNative.AsOfStrategy)
    // pruning through the as-of node: injected into the operator-
    // optimization fixed point, so ColumnPruning propagates the pushed
    // Projects down to the scans (see PruneAsOfChildren scaladoc)
    ext.injectOptimizerRule(_ =>
      graft.plans.AsOfJoinNative.PruneAsOfChildren)
  }
}
