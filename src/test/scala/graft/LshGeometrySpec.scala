package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Statistical quality pins for the hyperplane-LSH geometry — the
  * regression class the round-8→9 fix closed was invisible to every
  * exact-correctness test: the old Weyl-sequence hyperplanes were
  * strongly CORRELATED (all planes sawtooths of one sequence), so a
  * clustered corpus collapsed into hot sign-pattern buckets (measured
  * 9,819-vector buckets at 600k rows — 2.3B candidate pairs) while the
  * oracle still matched perfectly, because the oracle reproduces
  * whatever the hyperplanes are. These tests pin the two properties
  * that matter instead:
  *
  *  1. DISCRIMINATION — on a deliberately clustered corpus (the shape
  *     real embedding lakes have), bucket occupancy must stay within a
  *     small factor of the uniform-hash expectation: correlated planes
  *     fail this by orders of magnitude (the old formula put ~30% of a
  *     cluster in ONE bucket).
  *  2. RECALL — genuinely near-identical vectors (cos ≈ 1) must still
  *     collide in at least one band with near-certainty; a hash that
  *     "fixed" skew by keying on anything but vector DIRECTION would
  *     fail this.
  */
class LshGeometrySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic structured corpus in the MakeSf heavy-perturbation
    * shape (the shape the round-8 regression actually bit on): base
    * unit vectors, each with `copies − 1` transforms = circular shift by
    * a random offset times per-dim sign flips. All distinct, all
    * pairwise far, but sharing low-level structure — exactly what
    * correlated hyperplanes fail to separate.
    */
  private def structured(nBase: Int, copies: Int,
                         dim: Int = 64): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(20260814L)
    var id = -1L
    (0 until nBase).flatMap { _ =>
      val b0 = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(b0.map(x => x * x).sum)
      val b = b0.map(x => (x / nrm).toFloat)
      Seq(b) ++ (1 until copies).map { _ =>
        val s = 1 + rnd.nextInt(dim - 1)
        Array.tabulate(dim)(d => b((d + s) % dim) * (rnd.nextInt(2) * 2 - 1))
      }
    }.map { v => id += 1; (id, v) }
  }

  test("structured corpora hash to near-uniform band occupancy (plane independence)") {
    GraftFunctions.register(spark)
    val n = 21000
    val df = structured(700, 30).toDF("vec_id", "embedding")
    val bpb = 11 // 2048 buckets/band -> mean occupancy ~10
    val occ = df
      .select(explode(array((0 until 4).map(b => struct(lit(b).as("band_idx"),
        expr(s"hyperplane_bits(embedding, $bpb, ${b * bpb})").as("band_hash"))): _*)).as("bb"))
      .groupBy("bb.band_idx", "bb.band_hash").agg(count(lit(1)).as("k"))
      .agg(max("k").as("max_occ"),
        sum(expr("k * (k - 1) / 2")).as("cand_pairs"))
      .head()
    val maxOcc = occ.getLong(0)
    val candPairs = occ.getDouble(1)
    // Measured on this corpus: independent (fmix32) planes give
    // max_occ ~80 and ~630k candidates; the correlated Weyl planes gave
    // max_occ ~600 and ~6.3M. Thresholds sit between the regimes with
    // margin on both sides.
    assert(maxOcc < 200,
      s"hot bucket of $maxOcc/$n vectors — hyperplanes are not discriminating structured corpora")
    assert(candPairs < 2000000.0,
      s"candidate mass $candPairs vs corpus $n — bucket skew is quadratic-making")
  }

  test("near-identical vectors collide in at least one band (recall floor)") {
    GraftFunctions.register(spark)
    // 2000 base vectors + a 0.5%-jitter twin each (the MakeSf light-twin
    // shape, cos ~ 0.99998). At bpb=16 the per-band collision prob for
    // theta ~ 0.006 rad is ~0.97; across 4 independent bands the miss
    // rate is ~1e-6 — assert >= 99% observed.
    val rnd = new scala.util.Random(77L)
    val base = Array.fill(2000)(Array.fill(64)(rnd.nextGaussian()))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val twin = v.map(x => (x * (1.0 + 0.005 * rnd.nextGaussian())).toFloat)
      Seq((i.toLong, v.map(_.toFloat)), (i.toLong + 1000000L, twin))
    }.toSeq
    val df = rows.toDF("vec_id", "embedding")
    val bpb = 16
    val banded = df.select(col("vec_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band_idx"),
        expr(s"hyperplane_bits(embedding, $bpb, ${b * bpb})").as("band_hash"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band_idx").as("band_idx"), col("bb.band_hash").as("band_hash"))
    val hits = banded.filter(col("vec_id") < 1000000L)
      .join(banded.filter(col("vec_id") >= 1000000L)
          .withColumn("vec_id", col("vec_id") - 1000000L),
        Seq("vec_id", "band_idx", "band_hash"))
      .select("vec_id").distinct().count()
    assert(hits >= 1980, s"only $hits/2000 jittered twins collide in any band")
  }
}
