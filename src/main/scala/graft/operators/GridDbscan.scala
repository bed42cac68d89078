package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic grid-DBSCAN: density clustering over integer grid
  * cells — the engine's density-based substitute for the reference's
  * HDBSCAN `cluster_locations`
  * (/root/reference/src/mhealth/location/distribution.py:42-61), which
  * delegates to an external library whose label assignment is neither
  * deterministic across versions nor expressible as a dataflow.
  *
  * Semantics (classic DBSCAN on the cell graph):
  *  - a CELL is core iff it holds >= minPts points of its entity;
  *  - core cells within Chebyshev distance 1 (8-neighborhood) connect;
  *    a cluster is a connected component of core cells, labeled by the
  *    MINIMUM cell code in the component (deterministic canonical id);
  *  - points in non-core cells attach to the minimum label among
  *    adjacent core cells (border points), else label -1 (noise).
  *
  * Plan shape: ONE aggregation rolls points up to (entity, cell,
  * count); a second collects each entity's occupied cells into an
  * array; the `rounds` fixed iterations of min-label propagation then
  * run INSIDE the row as nested array HOFs (per-entity local
  * clustering — zero shuffles, zero iterative joins), and one explode
  * + equi-join carries cell labels back to the points. Three exchanges
  * total, independent of `rounds` (the first cut of this operator
  * joined per round — ~20 tiny-data shuffle stages whose fixed
  * overheads dominated wall time). The in-row pass is O(cells² ×
  * rounds) per entity; occupied-CELL count per entity is orders of
  * magnitude below its point count for location data (choose eps so it
  * stays so — a coarser grid is the scale lever, exactly as in
  * production grid clustering).
  *
  * A FIXED round count keeps the operator a pure function of its input
  * — no driver-side convergence loop — and bounds the reachable
  * component diameter: location data clusters in few-cell blobs
  * (GridDbscanSpec asserts convergence on the test corpus), and any
  * caller can raise it. The default minPts mirrors the reference's
  * min_samples = 1 + n/20.
  */
object GridDbscan {

  /** Canonical cell code — injective and NON-NEGATIVE for |cx|, |cy|
    * < 1e6 (lat/lon cells are hundreds at most), so the -1 noise
    * sentinel can never collide with a real component label (an
    * unshifted cx*K + cy would make cell (0,-1) encode to exactly -1). */
  private def code(cx: Column, cy: Column): Column =
    (cx.cast("long") + 1000000L) * 2000000L + (cy.cast("long") + 1000000L)

  private def adjacent(a: Column, b: Column): Column =
    abs(a.getField("cx") - b.getField("cx")) <= 1 &&
      abs(a.getField("cy") - b.getField("cy")) <= 1

  /** Label every point of `pts` (columns: entityCol, cx, cy — extra
    * columns pass through) with (cluster, is_core). `minPts` None →
    * per-entity 1 + n/20. */
  def label(pts: DataFrame, entityCol: String,
            minPts: Option[Int] = None, rounds: Int = 8): DataFrame = {
    val e = col(entityCol)
    val cells = pts.groupBy(e, col("cx"), col("cy"))
      .agg(count(lit(1)).as("cnt"))
    val packed = cells
      .groupBy(e)
      .agg(collect_list(struct(col("cx"), col("cy"), col("cnt")))
        .as("cs"), sum(col("cnt")).as("n_total"))
    val minExpr: Column = minPts match {
      case Some(k) => lit(k.toLong)
      case None => lit(1L) + (col("n_total") / 20).cast("long")
    }
    // core cells with their initial canonical labels — the array the
    // in-row propagation iterates over
    val core0 = filter(col("cs"), c => c.getField("cnt") >= col("__minPts"))
    val withCore = packed
      .withColumn("__minPts", minExpr)
      .withColumn("core", transform(core0, c =>
        struct(c.getField("cx").as("cx"), c.getField("cy").as("cy"),
          code(c.getField("cx"), c.getField("cy")).as("label"))))
    // fixed-round min-label propagation, entirely inside the row:
    // label(c) = min label over adjacent core cells (self included)
    val propagated = (1 to rounds).foldLeft(withCore) { (df, _) =>
      df.withColumn("core", transform(col("core"), c =>
        struct(c.getField("cx").as("cx"), c.getField("cy").as("cy"),
          aggregate(filter(col("core"), o => adjacent(o, c)),
            c.getField("label"),
            (acc, o) => least(acc, o.getField("label"))).as("label"))))
    }
    // per-cell final labels: core cells carry their component label;
    // non-core cells borrow the min label of an adjacent core cell
    // (border) or -1 (noise)
    val cellLabels = propagated.select(e,
      explode(transform(col("cs"), c => {
        val same = filter(col("core"), o =>
          o.getField("cx") === c.getField("cx") &&
            o.getField("cy") === c.getField("cy"))
        val adjCore = filter(col("core"), o => adjacent(o, c))
        val isCore = size(same) > 0
        // a CORE cell keeps its own round-R label (one more neighbor
        // min here would silently be round R+1 and diverge from the
        // oracle's unrolled CTEs on non-converged inputs)
        struct(c.getField("cx").as("cx"), c.getField("cy").as("cy"),
          when(isCore, element_at(same, 1).getField("label"))
            .when(size(adjCore) > 0,
              aggregate(adjCore, lit(Long.MaxValue),
                (acc, o) => least(acc, o.getField("label"))))
            .otherwise(lit(-1L)).as("label"),
          isCore.as("is_core"))
      })).as("cl"))
      .select(e, col("cl.cx").as("cx"), col("cl.cy").as("cy"),
        col("cl.label").as("label"), col("cl.is_core").as("is_core"))
    pts.join(cellLabels, Seq(entityCol, "cx", "cy"), "left")
      .withColumn("cluster", coalesce(col("label"), lit(-1L)))
      .withColumn("is_core", coalesce(col("is_core"), lit(false)))
      .drop("label")
  }
}
