package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curvilinear cell vertices: the 4-corner (lat, lon) arrays every
  * ocean-realm output carries (the reference reads them precomputed from
  * the grid ancillary — original/subroutines/app_functions.py:564-598
  * `get_vertices_main`; this derives them from the 2-D cell-center
  * fields, the sibling of the per-axis midpoint bounds of
  * mop_utils.py:714-724 / q64).
  *
  * Derivation: two midpoint passes over the (j, i) index space. Pass 1
  * (along i within each j row) produces grid-node *columns* at half-i
  * positions; pass 2 (along j within each node column) moves those to
  * half-j positions, yielding the (J+1)×(I+1) node table. Edges
  * extrapolate by the adjacent spacing, exactly like the 1-D bounds.
  * For a bilinear (tilted) grid the result is the exact cell corner.
  *
  * Scale: two window passes (one shuffle each, partitioned by the
  * opposite index — thousands of partitions on a real grid) plus one
  * equi-join of cells to nodes and a final groupBy; everything is
  * key-partitioned with no driver-side work, so a 0.1° tripolar grid
  * (1.5M cells) or a per-tile batch of them distributes evenly.
  *
  * Precondition: at least 2 cells along each axis (midpoints need a
  * neighbor to extrapolate from), rows distinct on (j, i), and a DENSE
  * rectangular index space with non-null field values — on real model
  * grids the cell-center coordinate fields are defined even over
  * masked (land) cells, so densify the coordinate table before calling
  * this rather than dropping masked rows (a gap would make lag/lead
  * pair non-adjacent cells and shift every downstream node index).
  */
object Vertices {

  /** Grid-node values at half-index positions: input (j, i, fields...)
    * cell centers, output (jn, in, fields...) with jn ∈ 0..J, in ∈ 0..I
    * — node (jn, in) is the corner shared by cells (jn-1..jn, in-1..in). */
  def nodes(cells: DataFrame, j: String, i: String,
      fields: Seq[String]): DataFrame = {
    val half = halfPass(cells, part = j, along = i, out = "i_n", fields)
    halfPass(half, part = "i_n", along = j, out = "j_n", fields)
      .select((col("j_n") +: col("i_n") +: fields.map(col)): _*)
  }

  /** One midpoint pass: within each `part`, values ordered by `along`
    * become values at the `out` half-positions 0..N (interior midpoint,
    * edges extrapolated). */
  private def halfPass(df: DataFrame, part: String, along: String,
      out: String, fields: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(part)).orderBy(col(along))
    val nbr = fields.foldLeft(
      // run-end is detected from the index column itself: a field value
      // that happened to be null mid-run must not fake a partition edge
      df.withColumn("__x_idx", lead(col(along), 1).over(w))
        .withColumn("__p_idx", lag(col(along), 1).over(w))) { (d, f) =>
      d.withColumn(s"__p_$f", lag(col(f), 1).over(w))
        .withColumn(s"__x_$f", lead(col(f), 1).over(w))
    }
    def lowStruct = struct(col(along).cast("int").as(out) +: fields.map { f =>
      when(col("__p_idx").isNull,
          col(f) - (col(s"__x_$f") - col(f)) / 2.0)
        .otherwise((col(s"__p_$f") + col(f)) / 2.0).as(f)
    }: _*)
    def highStruct = struct((col(along) + 1).cast("int").as(out) +: fields.map {
      f => (col(f) + (col(f) - col(s"__p_$f")) / 2.0).as(f)
    }: _*)
    // every cell owns its low-side node; the last cell of the run also
    // emits the high edge, so N cells yield N+1 nodes
    nbr.select(col(part), explode(
        when(col("__x_idx").isNull, array(lowStruct, highStruct))
          .otherwise(array(lowStruct))).as("__n"))
      .select(col(part) +: (out +: fields).map(f => col(s"__n.$f")): _*)
  }

  /** 4-corner vertices per cell, CF counterclockwise order (SW, SE, NE,
    * NW) flattened to `<field>_sw/se/ne/nw` columns. `clampLat` bounds
    * that field to ±90 like the reference's latitude bounds
    * (mop_utils.py:729-735). */
  def vertices(cells: DataFrame, j: String, i: String, fields: Seq[String],
      clampLat: Option[String] = None): DataFrame = {
    val nd = nodes(cells, j, i, fields)
    val corners = cells.select(col(j), col(i), explode(array(
        struct(lit("sw").as("c"), col(j).cast("int").as("j_n"),
          col(i).cast("int").as("i_n")),
        struct(lit("se").as("c"), col(j).cast("int").as("j_n"),
          (col(i) + 1).cast("int").as("i_n")),
        struct(lit("ne").as("c"), (col(j) + 1).cast("int").as("j_n"),
          (col(i) + 1).cast("int").as("i_n")),
        struct(lit("nw").as("c"), (col(j) + 1).cast("int").as("j_n"),
          col(i).cast("int").as("i_n")))).as("k"))
      .select(col(j), col(i), col("k.c"), col("k.j_n"), col("k.i_n"))
    def clamped(f: String): Column =
      if (clampLat.contains(f)) greatest(least(col(f), lit(90.0)), lit(-90.0))
      else col(f)
    val aggs = for (f <- fields; c <- Seq("sw", "se", "ne", "nw"))
      yield max(when(col("c") === c, clamped(f))).as(s"${f}_$c")
    corners.join(nd, Seq("j_n", "i_n"))
      .groupBy(col(j), col(i))
      .agg(aggs.head, aggs.tail: _*)
  }
}
