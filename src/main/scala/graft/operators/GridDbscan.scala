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
  * Components are computed by `rounds` fixed iterations of min-label
  * propagation over the 8-neighbor graph — each round one equi-join +
  * one partial-aggregated groupBy on (entity, cx, cy), both
  * shuffle-partitionable at any scale (the cell table is bounded by
  * the occupied-cell count, orders of magnitude below the point
  * count). A FIXED round count keeps the operator a pure function of
  * its input — no driver-side convergence loop — and `rounds` bounds
  * the reachable component diameter: location data clusters in
  * few-cell blobs (GridDbscanSpec asserts convergence on the test
  * corpus), and any caller can raise it. The default minPts mirrors
  * the reference's min_samples = 1 + n/20.
  */
object GridDbscan {

  private val offsets: Seq[(Int, Int)] =
    for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)

  /** Canonical cell code — injective and NON-NEGATIVE for |cx|, |cy|
    * < 1e6 (lat/lon cells are hundreds at most), so the -1 noise
    * sentinel can never collide with a real component label (an
    * unshifted cx*K + cy would make cell (0,-1) encode to exactly -1). */
  private def code(cx: Column, cy: Column): Column =
    (cx.cast("long") + 1000000L) * 2000000L + (cy.cast("long") + 1000000L)

  /** Label every point of `pts` (columns: entityCol, cx, cy — extra
    * columns pass through) with (cluster, is_core). `minPts` None →
    * per-entity 1 + n/20. */
  def label(pts: DataFrame, entityCol: String,
            minPts: Option[Int] = None, rounds: Int = 8): DataFrame = {
    val e = col(entityCol)
    val cells = pts.groupBy(e, col("cx"), col("cy"))
      .agg(count(lit(1)).as("cnt"))
    val minExpr: Column = minPts match {
      case Some(k) => lit(k.toLong)
      case None =>
        // reference default min_samples = 1 + len(df)//20
        lit(1L) + col("n_total").cast("long").divide(20).cast("long")
    }
    val withTotals = minPts match {
      case Some(_) => cells
      case None =>
        val totals = pts.groupBy(e).agg(count(lit(1)).as("n_total"))
        cells.join(totals, Seq(entityCol))
    }
    val core0 = withTotals.where(col("cnt") >= minExpr)
      .select(e, col("cx"), col("cy"),
        code(col("cx"), col("cy")).as("label"))

    val off = explode(array(offsets.map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }: _*)).as("o")
    // neighbor-min table, keyed back on (entity, cx, cy) target names so
    // the propagation join is a plain using-columns equi-join (no
    // self-join attribute ambiguity)
    def neighborMin(src: DataFrame): DataFrame = src
      .select(e, col("cx"), col("cy"), col("label"), off)
      .select(e, (col("cx") + col("o.dx")).as("tx"),
        (col("cy") + col("o.dy")).as("ty"), col("label"))
      .groupBy(e, col("tx"), col("ty"))
      .agg(min(col("label")).as("ml"))
      .withColumnRenamed("tx", "cx").withColumnRenamed("ty", "cy")

    // fixed-round min-label propagation among core cells ((0,0) offset
    // included, so every core cell sees its own label each round)
    var lab = core0
    for (_ <- 1 to rounds)
      lab = lab.select(e, col("cx"), col("cy"))
        .join(neighborMin(lab), Seq(entityCol, "cx", "cy"))
        .select(e, col("cx"), col("cy"), col("ml").as("label"))

    // the final labels feed BOTH the core-point path and the border
    // path — cache the (tiny) cell-label table for the one pass
    val labC = graft.core.Caches.cached(lab)
    val borderMin = neighborMin(labC)
    val nonCore = cells.select(e, col("cx"), col("cy"))
      .join(core0.select(e, col("cx"), col("cy")),
        Seq(entityCol, "cx", "cy"), "left_anti")
    val cellLabels = labC
      .select(e, col("cx"), col("cy"), col("label"),
        lit(true).as("is_core"))
      .union(nonCore
        .join(borderMin, Seq(entityCol, "cx", "cy"), "left")
        .select(e, col("cx"), col("cy"),
          coalesce(col("ml"), lit(-1L)).as("label"),
          lit(false).as("is_core")))
    pts.join(cellLabels, Seq(entityCol, "cx", "cy"), "left")
      .withColumn("cluster", coalesce(col("label"), lit(-1L)))
      .withColumn("is_core", coalesce(col("is_core"), lit(false)))
      .drop("label")
  }
}
