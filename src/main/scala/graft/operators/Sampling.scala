package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling and dataset splitting —
  * the reproducibility primitive of a training-data pipeline: a row's
  * split/sample membership is a pure function of its id and a seed, so
  * the same corpus yields the same split on any cluster, any partition
  * layout, any Spark version — unlike `DataFrame.sample`/`sampleBy`,
  * whose output depends on partitioning. Row-local (no shuffle), one
  * md5 per row, codegen'd.
  */
object Sampling {

  /** Uniform hash in [0, 10000) from the row id and seed — the md5
    * machinery shared with [[Dedup.seededHash]], so DuckDB replicates
    * it exactly (`'0x' || substr(md5(...), 1, 15)` cast). */
  def hashE4(id: Column, seed: Int): Column =
    pmod(Dedup.seededHash(id.cast("string"), seed), lit(10000L))

  /** Keep approximately `keepE4`/10000 of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, keepE4: Int,
      seed: Int = 42): DataFrame =
    df.where(hashE4(col(idCol), seed) < keepE4)

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis
    * A-ES): the top-`k` rows by key `ln(u) / w`, where `u ∈ (0, 1]`
    * is the row's deterministic md5 uniform and `w` its positive
    * weight — each row's inclusion probability is proportional to
    * its weight, the quality-weighted corpus-selection step between
    * uniform hash sampling and the greedy best-first budget cut.
    *
    * Determinism: `u = (h+1)/2⁶⁰` from the shared md5 machinery
    * (both engines divide the same exact long by the same exact
    * power-of-two), the key floors to an e9 integer, ties break by
    * id. Content-addressed like every sampler here: membership is a
    * pure function of (id, seed, weight), independent of
    * partitioning. The top-k cut is a distributed TakeOrdered — no
    * global sort, no single-partition window.
    *
    * @return input rows + `wkey_e9`, the k winners. */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (Dedup.seededHash(col(idCol).cast("string"), seed) + lit(1L))
      .cast("double") / lit(1152921504606846976L) // 2^60
    val key = floor(lit(1000000000.0) * (log(u) / col(weightCol)))
      .cast("long")
    // w ≤ 0 makes ln(u)/w meaningless (±∞ keys would silently win or
    // lose the cut) — fail loudly per row instead
    val guarded = when(col(weightCol) > 0, key).otherwise(
      raise_error(concat(lit(s"weightedTopK: non-positive weight in " +
        s"'$weightCol' for id "), col(idCol).cast("string"))))
    df.withColumn("wkey_e9", guarded)
      .orderBy(col("wkey_e9").desc, col(idCol))
      .limit(k)
  }

  /** Per-stratum deterministic sampling — the corpus-balancing step of
    * a training-data pipeline (downsample over-represented languages /
    * sources to a target mix): each stratum value gets its own keep
    * rate in basis points; strata absent from `ratesE4` fall back to
    * `defaultE4`. Membership stays a pure function of (id, seed), so
    * rates can be retuned without reshuffling which rows survive
    * inside an unchanged stratum (a row kept at 2000 is still kept at
    * 3000 — the samples are nested, which makes ablation corpora
    * comparable). Row-local, no shuffle, codegen'd `when` chain (strata
    * counts are small — languages, sources — so the chain stays
    * shallow). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesE4: Map[String, Int], defaultE4: Int = 10000,
      seed: Int = 42): DataFrame = {
    require((defaultE4 +: ratesE4.values.toSeq)
      .forall(r => r >= 0 && r <= 10000), "rates are basis points")
    val rate = ratesE4.toSeq.sortBy(_._1).foldLeft(lit(defaultE4)) {
      case (acc, (v, r)) => when(col(stratumCol) === v, lit(r)).otherwise(acc)
    }
    df.where(hashE4(col(idCol), seed) < rate)
  }

  /** Deterministic shard assignment in [0, nShards): the output-layout
    * twin of [[splitColumn]] — a row's shard is a pure function of its
    * id and seed, so re-running the export on any cluster or partition
    * layout yields byte-identical shard membership (what makes a
    * training-data export resumable and diffable). */
  def shardColumn(id: Column, nShards: Int, seed: Int = 42): Column = {
    require(nShards > 0, "nShards must be positive")
    pmod(Dedup.seededHash(id.cast("string"), seed), lit(nShards.toLong))
  }

  /** Rebalance the corpus to a target source mixture (the "data
    * mixing" step of a training run: e.g. 40% web, 20% code, …).
    * Given target weights in basis points per stratum, finds the
    * LARGEST total corpus T achievable by pure downsampling — the
    * scarcest stratum relative to its weight binds, keeping all of
    * itself — and derives each stratum's keep rate in closed integer
    * form:
    *
    *   T        = min over strata of  count_s * 10000 / w_s
    *   rateE4_s = min(10000, T * w_s / count_s)
    *
    * (all divisions integer-floor, so the oracle replicates them
    * exactly). Strata absent from `weightsE4` are dropped — the target
    * mixture fully specifies the output corpus. Membership then uses
    * the same (id, seed) hash as [[stratifiedSample]], so the result
    * is partitioning-independent and nested under rate changes.
    *
    * The per-stratum counts are one small aggregation collected to the
    * driver — O(#strata) rows, inherent (the rates are a function of
    * the data), mirroring the catalog-read pattern; the returned rates
    * make the decision auditable. */
  def mixToTarget(df: DataFrame, idCol: String, stratumCol: String,
      weightsE4: Map[String, Int], seed: Int = 42)
      : (DataFrame, Map[String, Int]) = {
    require(weightsE4.nonEmpty && weightsE4.values.forall(_ > 0),
      "weights are positive basis points")
    val counts = df
      .where(col(stratumCol).isin(weightsE4.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weightsE4.filter { case (s, _) => counts.contains(s) }
    if (present.isEmpty) // no weighted stratum exists in the data
      return (df.where(lit(false)), Map.empty)
    val t = present.map { case (s, w) => counts(s) * 10000L / w }.min
    val rates = present.map { case (s, w) =>
      s -> math.min(10000L, t * w / counts(s)).toInt
    }
    val sampled = stratifiedSample(
      df.where(col(stratumCol).isin(present.keys.toSeq: _*)),
      idCol, stratumCol, rates, defaultE4 = 0, seed = seed)
    (sampled, rates)
  }

  /** Deterministic UPSAMPLING to per-stratum epoch rates — the other
    * half of data mixing (downsampling alone can't give a scarce,
    * high-quality source more than one epoch): `ratesE4/10⁴` is the
    * target epoch count per stratum, realized as `floor(rate)` whole
    * copies of every row plus one extra copy for the rows whose
    * (id, seed) hash falls under the fractional remainder — so a
    * 2.5-epoch source repeats every row twice and half its rows (a
    * deterministic, content-addressed half) a third time.
    *
    * Each emitted row carries `copy_idx` (0-based) so downstream
    * shuffles/packing can separate epochs. Row-local explode — no
    * shuffle, no driver state; expected output size is exactly
    * `Σ n_s · rate_s`. Rates below 10⁴ are rejected — downsample
    * with [[stratifiedSample]]/[[mixToTarget]] instead, keeping the
    * two directions composable and each loud about its domain. */
  def upsampleToRates(df: DataFrame, idCol: String, stratumCol: String,
      ratesE4: Map[String, Int], defaultE4: Int = 10000,
      seed: Int = 42): DataFrame = {
    require((ratesE4.values ++ Seq(defaultE4)).forall(_ >= 10000),
      "upsample rates are >= 10000 basis points (1.0 epochs); " +
        "downsample with stratifiedSample/mixToTarget")
    val rate = ratesE4.foldLeft(lit(defaultE4)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    val whole = (rate / lit(10000)).cast("int")
    val frac = rate % lit(10000)
    val copies = whole +
      when(hashE4(col(idCol), seed) < frac, lit(1)).otherwise(lit(0))
    df.withColumn("copy_idx",
        explode(sequence(lit(0), copies - lit(1))))
      .withColumn("copy_idx", col("copy_idx").cast("long"))
  }

  /** Temperature-scaled source rebalancing (the `n^α` mixing rule of
    * multilingual/multi-source LM training — downweight huge sources
    * without flattening the mixture) at α = 0.5: target sizes ∝
    * √n_s, realized by pure downsampling with the SMALLEST source
    * kept whole — `rateE4_s = min(10⁴, floor(10⁴·√n_min / √n_s))`.
    * α is FIXED at 0.5 deliberately: `sqrt` is IEEE-754
    * correctly-rounded, so Spark, the JVM driver, and the DuckDB
    * oracle compute bit-identical rates — a general `pow(n, α)` is
    * only faithfully-rounded and could flip a floor boundary between
    * libms. No float summation appears anywhere (rates derive from
    * pairwise min/divide only), for the same reason.
    *
    * Membership is the same (id, seed) hash as [[stratifiedSample]]
    * — partitioning-independent, nested under rate changes. The
    * per-source counts are one O(#strata) driver aggregation, like
    * [[mixToTarget]]; returned rates make the decision auditable. */
  def mixByTemperatureSqrt(df: DataFrame, idCol: String, stratumCol: String,
      seed: Int = 42): (DataFrame, Map[String, Int]) = {
    val counts = df
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return (df.where(lit(false)), Map.empty)
    val nMin = counts.values.min
    val rates = counts.map { case (s, n) =>
      s -> math.min(10000L,
        math.floor(10000.0 * math.sqrt(nMin.toDouble) /
          math.sqrt(n.toDouble)).toLong).toInt
    }
    (stratifiedSample(df, idCol, stratumCol, rates, defaultE4 = 0, seed),
      rates)
  }

  /** Deterministic per-group fixed-size sample: the `k` rows of each
    * group with the SMALLEST seeded content hash — a hash reservoir.
    * Uniform within the group (the hash is uniform in the id),
    * reproducible on any cluster or partition layout (unlike an RDD
    * reservoir, whose result depends on partition iteration order),
    * and NESTED in k: the k=3 sample is a prefix of the k=5 sample,
    * so growing an inspection sample never churns the rows already
    * reviewed. The per-source eyeball sample every corpus audit
    * starts from.
    *
    * Scale shape: ONE hash partitioning on the group key serves the
    * rank window; state per group is the current row only, and k rows
    * per group survive the filter — output is O(groups × k) no matter
    * the corpus size. No global sort, no driver-side collection.
    * Output: input columns + `sample_rank` (1-based within group). */
  def topKByHash(df: DataFrame, idCol: String, groupCol: String, k: Int,
      seed: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(Dedup.seededHash(col(idCol).cast("string"), seed),
        col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** LEAKAGE-SAFE split assignment: the train/val/test hash is
    * computed on a provided GROUP label — canonically the near-dup
    * component from [[Dedup.connectedComponents]] — instead of the
    * row id, so every member of a duplicate cluster lands in the SAME
    * split and a near-copy of an eval document can never leak into
    * train (the contamination mode a per-doc split hash cannot
    * prevent: two 95%-identical docs hash independently). Same
    * nested hash-range machinery as [[splitColumn]]; cost is one join
    * on the label frame (labels are one row per doc, AQE
    * broadcast-or-shuffle sized). Output keeps the label as
    * `split_group` — the auditable unit of assignment. */
  def splitByGroup(df: DataFrame, idCol: String, groups: DataFrame,
      groupIdCol: String, groupLabelCol: String,
      fractionsE4: Seq[(String, Int)], seed: Int = 42): DataFrame =
    df.join(
        groups.select(col(groupIdCol).as(idCol),
          col(groupLabelCol).as("split_group")),
        Seq(idCol))
      .withColumn("split", splitColumn(col("split_group"), fractionsE4, seed))

  /** Assign each row to a named split by cumulative hash ranges, e.g.
    * `Seq("train" -> 9000, "val" -> 500, "test" -> 500)` (basis points,
    * must sum to ≤ 10000; a shortfall leaves rows unassigned → null). */
  def splitColumn(id: Column, fractionsE4: Seq[(String, Int)],
      seed: Int = 42): Column = {
    require(fractionsE4.map(_._2.toLong).sum <= 10000L,
      "split fractions exceed 10000 basis points")
    val h = hashE4(id, seed)
    val (cases, _) = fractionsE4.foldLeft(
      (lit(null).cast("string"), 0L)) { case ((acc, lo), (name, f)) =>
      (when(h >= lo && h < lo + f, lit(name)).otherwise(acc), lo + f)
    }
    cases
  }
}
