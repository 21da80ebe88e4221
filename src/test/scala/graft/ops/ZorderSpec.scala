package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering (Layout.mortonKey / zorderWrite): key bit math vs a
  * reference implementation, and the property the layout exists for —
  * per-file bounding boxes tight enough that a 2-D box predicate prunes
  * most files via parquet min/max stats. */
class ZorderSpec extends SparkSpec {
  /** Reference Morton implementation (bit-by-bit, obviously correct). */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("mortonKey matches the bit-by-bit reference across the domain") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 70000L), (-1L, 3L)) ++
      (0 until 200).map(i => ((i * 131L) % 65536, (i * 257L) % 65536))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonKey(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === mortonRef(x & 0xFFFF, y & 0xFFFF),
        s"morton($x, $y)")
    }
  }

  test("zorderWrite: every file's (x, y) bounding box is tight, rows kept") {
    // 64×64 grid, shuffled — a row-ordered write would give each file the
    // FULL y range (bbox area ≈ 64 × 4096/n); z-order gives ~square tiles
    val n = 16
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), floor(col("id") / 64).as("y"))
      .repartition(8) // destroy incoming order: clustering must come from z
    val dir = tmpDir("zorder") + "/t"
    Layout.zorderWrite(grid.toDF(), dir, "x", "y", n)

    val fs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    assert(fs.length === n)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    assert(back.select(col("x"), col("y")).distinct().count() === 4096)

    // ideal: 16 aligned 16×16 z-tiles, total bbox area = grid area (4096).
    // Range-boundary sampling can misalign a couple of files across a
    // major z-quadrant (those bboxes balloon), so assert in aggregate:
    // total area ≤ 3× grid — a row-major layout of 64-wide strips has
    // total ≥ 16 × (64 × 4) = 4096 but EVERY file spans x fully, which
    // the box-pruning check below would catch at 16/16 hits
    val boxes = fs.map { f =>
      val s = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
    }
    val totalArea = boxes.map { case (x0, x1, y0, y1) =>
      (x1 - x0 + 1) * (y1 - y0 + 1)
    }.sum
    assert(totalArea <= 3 * 4096L,
      s"total bbox area $totalArea — files not 2-D clustered")

    // the pruning property itself: an 8×8 box intersects few of the 16
    // file bboxes (1 aligned tile; slack for boundary-straddling files)
    val hit = boxes.count { case (x0, x1, y0, y1) =>
      !(x1 < 8 || x0 > 15 || y1 < 8 || y0 > 15)
    }
    assert(hit <= 6, s"box query intersects $hit of $n files — not clustered")
  }
}
