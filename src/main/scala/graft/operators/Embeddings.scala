package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-store maintenance: L2 normalization and symmetric int8
  * (maxabs) quantization — the standard 4x compression applied before an
  * embedding corpus is served or shipped to an ANN index.
  *
  * Scale design: pure per-row projects over the vector column — no
  * shuffle, fused by Catalyst into the surrounding stage. These run as
  * interpreted higher-order functions, which is fine for a
  * once-per-corpus maintenance pass (unlike the per-candidate-pair hot
  * loops, which use native expressions — ArrayCosine, SignProjections);
  * if quantization ever lands in a verify hot path, promote it to a
  * native expression the same way.
  */
object Embeddings {

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  def l2Norm(vec: Column): Column =
    sqrt(aggregate(asDouble(vec), lit(0.0), (acc, x) => acc + x * x))

  def maxAbs(vec: Column): Column =
    aggregate(asDouble(vec), lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Unit-norm copy of the vector (null-safe zero vectors pass through). */
  def normalized(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n > 0, transform(asDouble(vec), x => x / n)).otherwise(asDouble(vec))
  }

  /** Symmetric int8 codes: round(127 * x / maxabs) via floor(y + 0.5) —
    * a formulation both engines evaluate identically in IEEE doubles
    * (round() half-rule conventions differ between engines; floor+0.5
    * does not). Zero vectors quantize to all-zero codes.
    */
  def int8Codes(vec: Column): Column = {
    val m = maxAbs(vec)
    transform(asDouble(vec), x =>
      when(m > 0, floor(x * 127.0 / m + 0.5)).otherwise(lit(0.0)).cast("int"))
  }

  /** Deterministic ±1 projection matrix for Johnson-Lindenstrauss sign
    * random projection (Achlioptas 2003's database-friendly variant with
    * p=1/2): sign(j,i) = low bit of fmix32(FNV-1a-32("j:i")), where
    * fmix32 is MurmurHash3's finalizer. The avalanche step matters: the
    * raw FNV low bit is just the parity of the input bytes' low bits
    * (odd-multiplier arithmetic preserves parity), which makes rows of
    * the matrix exact negations of each other. Generated on both engines
    * from the same literals — the matrix is embedded in the plan and in
    * the oracle SQL, so no cross-engine RNG is involved.
    */
  def projectionSigns(outDims: Int, inDims: Int): Array[Array[Double]] =
    Array.tabulate(outDims, inDims) { (j, i) =>
      var h = 0x811c9dc5L // FNV-1a 32-bit offset basis
      s"$j:$i".getBytes("UTF-8").foreach { b =>
        h = ((h ^ (b & 0xffL)) * 0x01000193L) & 0xffffffffL
      }
      h ^= h >>> 16; h = (h * 0x85ebca6bL) & 0xffffffffL
      h ^= h >>> 13; h = (h * 0xc2b2ae35L) & 0xffffffffL
      h ^= h >>> 16
      if ((h & 1L) == 0L) 1.0 else -1.0
    }

  /** JL sign random projection to `outDims` dimensions, scaled by
    * 1/sqrt(outDims): r_j = sum_i(sign(j,i) * x_i) / sqrt(outDims).
    * Output: (id, r0..r{outDims-1}) rounded to 6 dp.
    *
    * Scale design: a pure per-row project (the matrix is plan literals),
    * fused into the corpus scan — the 100 TB cost is the scan itself,
    * and downstream ANN/cluster passes run on outDims/inDims of the data.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, inDims: Int): DataFrame = {
    val signs = projectionSigns(outDims, inDims)
    val scale = lit(math.sqrt(outDims.toDouble))
    val outs = (0 until outDims).map { j =>
      val dot = aggregate(
        zip_with(asDouble(col(vecCol)), typedLit(signs(j).toSeq),
          (x, s) => x * s),
        lit(0.0), (acc, t) => acc + t)
      round(dot / scale, 6).as(s"r$j")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** Rows of (id, maxabs, codes) — the stored quantized form. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), round(maxAbs(col(vecCol)), 6).as("maxabs"),
      int8Codes(col(vecCol)).as("codes"))

  /** Scalar digest of the quantized form, for oracle-checked verification
    * (the driver's comparator needs scalar cells): dims, L2 norm, maxabs,
    * and a position-weighted code checksum sum(i * code_i) that pins every
    * code and its position without emitting the array.
    */
  def int8Digest(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val weighted = zip_with(int8Codes(v), sequence(lit(1), size(v)),
      (c, i) => c.cast("double") * i.cast("double"))
    df.select(
      col(idCol),
      size(v).cast("long").as("n_dims"),
      round(l2Norm(v), 6).as("l2_norm"),
      round(maxAbs(v), 6).as("maxabs"),
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
        .cast("long").as("code_checksum"))
  }

  // --- PCA whitening (round 9) ---

  private type CovPartial = (Long, Array[Double], Array[Double])

  /** The corpus's (n, mean, sample covariance) in ONE pass: per
    * partition an imperative dims²-sized accumulator (the genuine
    * per-partition-state case mapPartitions exists for — a per-row
    * expression would explode dims² columns or rows), then a
    * DETERMINISTIC two-level fold of the O(dims²) partials. A plain
    * treeReduce combines partials in task-completion order, so the
    * float sums (and their 6 dp roundings downstream) would depend on
    * scheduler timing; instead each group of 64 partition partials is
    * left-folded in partition-index order inside one task, and the
    * driver left-folds the group results in group-index order — the
    * result is a pure function of the input partitioning, bit-stable
    * across runs. Driver state is O(P/64 · dims²) doubles — at 100 TB
    * with 100k scan partitions and dims=64 that is ~1.6k groups ×
    * 32 KB ≈ 50 MB, a parameter-bounded collect. Covariance =
    * (Σxxᵀ − n·μμᵀ)/(n−1), the sample (covar_samp) convention.
    */
  def covarianceStats(df: DataFrame, vecCol: String, dims: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    require(dims >= 1, "dims >= 1")
    // Mutation contract: combine OWNS its left operand and accumulates
    // the right into it in place. Safe because every left operand is a
    // freshly-deserialized shuffle partial or a collect() copy consumed
    // exactly once by the fold below — never cache the partials RDD or
    // reuse a partial after folding.
    def combine(a: CovPartial, b: CovPartial): CovPartial = {
      val (n1, s1, ss1) = a; val (n2, s2, ss2) = b
      var i = 0
      while (i < dims) { s1(i) += s2(i); i += 1 }
      i = 0
      while (i < dims * dims) { ss1(i) += ss2(i); i += 1 }
      (n1 + n2, s1, ss1)
    }
    val groupSize = 64
    val partials = df.select(col(vecCol).cast("array<double>")).rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val s = Array.fill(dims)(0.0)
        val ss = Array.fill(dims * dims)(0.0)
        var n = 0L
        it.foreach { row =>
          val x = row.getSeq[Double](0)
          require(x.length == dims, s"expected $dims dims, got ${x.length}")
          var i = 0
          while (i < dims) {
            val xi = x(i)
            s(i) += xi
            var j = 0
            while (j < dims) { ss(i * dims + j) += xi * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((idx / groupSize, (idx, (n, s, ss))))
      }
    // Reducer count tracks the GROUP key space (ceil(P/64)), not the
    // upstream partition count — without it groupByKey inherits P
    // partitions and schedules ~100k near-empty reduce tasks at the
    // 100k-scan-partition scale for only ~1.6k keys.
    val numGroups = math.max(1,
      (partials.getNumPartitions + groupSize - 1) / groupSize)
    val groups = partials
      .groupByKey(numGroups)
      .mapValues(ps => ps.toSeq.sortBy(_._1).map(_._2).reduceLeft(combine))
      .collect()
      .sortBy(_._1)
    require(groups.nonEmpty, "covariance needs >= 2 rows, got 0")
    val (n, s, ss) = groups.map(_._2).reduceLeft(combine)
    require(n >= 2, s"covariance needs >= 2 rows, got $n")
    val mean = s.map(_ / n)
    // n * (mean_i * mean_j): the inner product is commutative, so the
    // matrix is symmetric to the LAST BIT (left-associated
    // n*mean_i*mean_j would differ across the diagonal by an ulp)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      (ss(i * dims + j) - n * (mean(i) * mean(j))) / (n - 1).toDouble
    }
    (n, mean, cov)
  }

  /** The covariance UPPER TRIANGLE as rows (i, j, cov) rounded 6dp —
    * the exactly-oracle-able sufficient statistic of the whitening pass
    * (DuckDB recomputes it as covar_samp per dimension pair).
    */
  def covarianceDf(df: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, _, cov) = covarianceStats(df, vecCol, dims)
    val rows = for (i <- 0 until dims; j <- i until dims) yield
      (i.toLong, j.toLong, BigDecimal(cov(i)(j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    rows.toDF("i", "j", "cov")
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: returns (eigenvalues, eigenvectors-as-rows) sorted by
    * eigenvalue DESC, each vector sign-fixed so its largest-magnitude
    * component is positive (ties to the lower index) — the two
    * conventions that make the decomposition a pure function of the
    * input matrix. O(dims³) per sweep on the DRIVER: dims is a model
    * parameter (64 here), never a data size.
    */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 100,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > tol) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t =
            if (theta == 0.0) 1.0 // tan(2φ) = ∞ → the 45° rotation
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val pairs = (0 until n).map { j =>
      val vec = Array.tabulate(n)(i => v(i)(j))
      // sign convention: largest-|component| positive, ties to lower idx
      val m0 = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      (a(j)(j), if (vec(m0) < 0) vec.map(-_) else vec)
    }.sortBy { case (ev, _) => -ev }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** PCA-whitened projection to the top `k` components: one stats pass
    * (covarianceStats), a driver-side Jacobi eigendecomposition of the
    * dims×dims covariance, then a pure per-row plan-literal projection
    * out_j = Σ_i (x_i − μ_i)·v_ji / sqrt(λ_j) — SemanticDedup's
    * centroids-as-literals move, fused into the corpus scan. Components
    * with eigenvalue ≤ `minVariance` are rejected (whitening divides by
    * sqrt(λ); a near-null direction would amplify noise unboundedly).
    * Output: (id, w0..w{k−1}) rounded 6dp.
    */
  def pcaWhiten(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      k: Int, minVariance: Double = 1e-9): DataFrame = {
    require(k >= 1 && k <= dims, s"need 1 <= k <= $dims, got $k")
    val (_, mean, cov) = covarianceStats(df, vecCol, dims)
    val (evals, evecs) = jacobiEigen(cov)
    require(evals(k - 1) > minVariance,
      s"component ${k - 1} has variance ${evals(k - 1)} <= $minVariance — " +
        "whitening would divide by ~zero; lower k")
    val centered = zip_with(transform(col(vecCol), x => x.cast("double")),
      typedLit(mean.toSeq), (x, mu) => x - mu)
    val outs = (0 until k).map { j =>
      val dot = aggregate(
        zip_with(centered, typedLit(evecs(j).toSeq), (x, w) => x * w),
        lit(0.0), (acc, t) => acc + t)
      round(dot / math.sqrt(evals(j)), 6).as(s"w$j")
    }
    df.select(col(idCol) +: outs: _*)
  }
}
