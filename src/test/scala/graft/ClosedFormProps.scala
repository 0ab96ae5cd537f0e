package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the round-8 CLOSED FORMS — the
  * algebraic identities that let sequential textbook definitions run
  * as declarative window/aggregate plans (and be oracle-mirrored
  * exactly). The Spark implementations are oracle-checked on the
  * fixture; these properties pin that the closed forms themselves
  * equal their sequential definitions on arbitrary inputs, so the
  * oracle agreement isn't a fixture accident.
  */
object ClosedFormProps extends Properties("graft.closedforms") {

  private val series: Gen[List[Long]] =
    Gen.choose(1, 200).flatMap(n => Gen.listOfN(n, Gen.choose(-1000L, 1000L)))

  // ts_changepoint_cusum: S_t = max(0, S_{t-1} + y_t)  ≡  P_t − min(0, min_{j≤t} P_j)
  property("cusum prefix-sum closed form equals the textbook recursion") =
    Prop.forAll(series) { ys =>
      val direct = ys.scanLeft(0L)((s, y) => math.max(0L, s + y)).tail
      val prefix = ys.scanLeft(0L)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min)
      }
      direct == closed
    }

  // the two-sided twin used for cusum_dn
  property("downward cusum closed form equals its recursion") =
    Prop.forAll(series) { ys =>
      val direct = ys.scanLeft(0L)((s, y) => math.max(0L, s - y)).tail
      val prefix = ys.scanLeft(0L)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        math.max(0L, prefix.take(i + 1).max) - p
      }
      direct == closed
    }

  private val weights: Gen[List[Long]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 1000000L)))

  // pipeline_mix_epoch_schedule: DIV/MOD + largest-remainder rank
  property("largest-remainder quotas sum to the budget, each within 1 of exact") =
    Prop.forAll(weights, Gen.choose(1L, 10000000L)) { (ws, budget) =>
      val c = ws.sum
      val base = ws.map(w => budget * w / c)
      val rem = ws.map(w => budget * w % c)
      val leftover = (budget - base.sum).toInt
      val extraIdx = rem.zipWithIndex
        .sortBy { case (r, i) => (-r, i) }.take(leftover).map(_._2).toSet
      val quota = base.zipWithIndex.map { case (b, i) =>
        b + (if (extraIdx(i)) 1L else 0L)
      }
      (quota.sum == budget) :| s"sum ${quota.sum} != $budget" &&
        quota.zip(ws).forall { case (q, w) =>
          val exact = budget.toDouble * w / c
          q == math.floor(exact).toLong || q == math.ceil(exact).toLong
        } :| "every quota must be the floor or ceil of its exact share"
    }

  private val weighted: Gen[List[(Long, Long)]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(-100L, 100L), Gen.choose(1L, 50L))))

  // agg_weighted_median: least v with 2·cumweight(≤v) ≥ totweight
  // satisfies the defining inequalities of a weighted median
  property("cumweight rule yields a true weighted median") =
    Prop.forAll(weighted) { xs =>
      val tw = xs.map(_._2).sum
      val byV = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      val cum = byV.scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (v, w)) => (v, acc + w)
      }.tail
      val med = cum.find { case (_, cw) => 2 * cw >= tw }.get._1
      val below = xs.filter(_._1 < med).map(_._2).sum
      val above = xs.filter(_._1 > med).map(_._2).sum
      (2 * below <= tw) :| s"mass below $med exceeds half" &&
        (2 * above <= tw) :| s"mass above $med exceeds half"
    }

  // events_ab_cuped: the sums-only adjusted mean equals the
  // per-unit definition mean(y − θ(x − x̄)) exactly in exact
  // arithmetic (verified here in rationals via BigDecimal)
  property("CUPED adjusted mean from sums equals the per-unit definition") =
    Prop.forAll(Gen.choose(2, 50).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 100L), Gen.choose(0L, 100L))))) { xs =>
      val n = xs.length
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxx = xs.map(p => p._1 * p._1).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val den = n * sxx - sx * sx
      (den != 0L) ==> {
        val theta = BigDecimal(n * sxy - sx * sy) / BigDecimal(den)
        val xbar = BigDecimal(sx) / n
        val perUnit = xs.map { case (x, y) =>
          BigDecimal(y) - theta * (BigDecimal(x) - xbar)
        }.sum / n
        val fromSums = BigDecimal(sy) / n -
          theta * (BigDecimal(sx) / n - xbar)
        // xbar here is the same population, so the correction term is
        // zero and both reduce to mean_y — the NON-trivial case is a
        // sub-population vs global x̄:
        val half = xs.take(n / 2 max 1)
        val (hx, hy, hn) = (half.map(_._1).sum, half.map(_._2).sum, half.length)
        val perUnitHalf = half.map { case (x, y) =>
          BigDecimal(y) - theta * (BigDecimal(x) - xbar)
        }.sum / hn
        val fromSumsHalf = BigDecimal(hy) / hn -
          theta * (BigDecimal(hx) / hn - xbar)
        (perUnit - fromSums).abs < BigDecimal("1e-18") &&
          (perUnitHalf - fromSumsHalf).abs < BigDecimal("1e-18")
      }
    }
  // ts_theil_sen: "least distinct slope with cumcount >= (m+1) DIV 2"
  // over grouped slope counts equals the direct rank-(m+1)/2 element
  // of the sorted slope multiset (the percentile_disc convention).
  property("distinct-slope cumulative median equals the direct multiset median") =
    Prop.forAll(Gen.choose(1, 120).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-500L, 500L)))) { slopes =>
      val m = slopes.length.toLong
      val direct = slopes.sorted.apply(((m + 1) / 2 - 1).toInt)
      val grouped = slopes.groupBy(identity).view
        .mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val cum = grouped.scanLeft(("sentinel" -> 0L)._2)(_ + _._2).tail
      val closed = grouped.zip(cum)
        .collectFirst { case ((v, _), c) if c >= (m + 1) / 2 => v }.get
      (closed == direct) :| s"closed $closed vs direct $direct (m=$m)"
    }

  // agg_hhi_concentration: PPM quantization loses at most 3 ppm of
  // HHI (shares floor-quantized: Σ2xδ <= 2e6 ppm², plus the final
  // integer division) — and never over-counts.
  property("ppm-quantized HHI within 3 ppm below the exact index, never above") =
    Prop.forAll(Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(1L, 1000000L)))) { cents =>
      val s = cents.sum
      val shares = cents.map(c => c * 1000000L / s)
      val hhiQ = shares.map(x => x * x).sum / 1000000L
      val exact = cents.map(c => BigDecimal(c) / BigDecimal(s)).map(x => x * x).sum
      val exactPpm = (exact * 1000000).toDouble
      (hhiQ <= math.floor(exactPpm) + 1e-9) :| s"over-count: $hhiQ vs $exactPpm" &&
        (hhiQ >= exactPpm - 3.0) :| s"lost >3ppm: $hhiQ vs $exactPpm"
    }

  // privacy_generalization_ladder: widening the bucket (w2 a multiple
  // of w1) only MERGES groups, so the min group size is monotone
  // non-decreasing and the violation count non-increasing up the
  // ladder — the property that makes "minimal compliant level" well
  // defined.
  property("generalization ladder is monotone: wider buckets never shrink groups") =
    Prop.forAll(Gen.choose(1, 200).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 5000L)))) { vals =>
      def sizes(w: Long) = vals.groupBy(_ / w).values.map(_.length).toList
      val ws = List(10L, 100L, 1000L)
      val mins = ws.map(w => sizes(w).min)
      val viols = ws.map(w => sizes(w).count(_ < 5))
      (mins == mins.sorted) :| s"min sizes not monotone: $mins" &&
        (viols == viols.sorted.reverse) :| s"violations not monotone: $viols"
    }

  // ---- round 10 ----

  private val twoSamples: Gen[(List[Long], List[Long])] = for {
    n1 <- Gen.choose(1, 60); n2 <- Gen.choose(1, 60)
    xs <- Gen.listOfN(n1, Gen.choose(0L, 20L))   // narrow domain → ties
    ys <- Gen.listOfN(n2, Gen.choose(0L, 20L))
  } yield (xs, ys)

  /** agg_mann_whitney's grid closed form: 2×U for the second sample
    * from value-distinct cells (2·cum< + tie count), as the key
    * computes it.
    */
  private def u2FromCells(xs: List[Long], ys: List[Long]): Long = {
    val vals = (xs ++ ys).distinct.sorted
    val cc = vals.map(v => xs.count(_ == v).toLong)
    val ct = vals.map(v => ys.count(_ == v).toLong)
    val cumLt = cc.scanLeft(0L)(_ + _).init
    vals.indices.map(i => ct(i) * (2 * cumLt(i) + cc(i))).sum
  }

  property("Mann-Whitney grid form equals the pairwise definition") =
    Prop.forAll(twoSamples) { case (xs, ys) =>
      val brute = (for (x <- xs; y <- ys) yield {
        if (y > x) 2L else if (y == x) 1L else 0L
      }).sum
      u2FromCells(xs, ys) == brute
    }

  property("Mann-Whitney complementarity: U2(a) + U2(b) = 2·n1·n2") =
    Prop.forAll(twoSamples) { case (xs, ys) =>
      u2FromCells(xs, ys) + u2FromCells(ys, xs) ==
        2L * xs.length * ys.length
    }

  // agg_ks_test: the cross-multiplied grid maximum equals the
  // brute-force ECDF gap over every pooled support point.
  property("KS grid maximum equals the brute-force ECDF gap") =
    Prop.forAll(twoSamples) { case (xs, ys) =>
      val n1 = xs.length.toLong; val n2 = ys.length.toLong
      val vals = (xs ++ ys).distinct.sorted
      val grid = vals.map(v =>
        math.abs(xs.count(_ <= v) * n2 - ys.count(_ <= v) * n1)).max
      val brute = (xs ++ ys).distinct.map(v =>
        math.abs(xs.count(_ <= v) * n2 - ys.count(_ <= v) * n1)).max
      grid == brute && grid <= n1 * n2
    }

  // agg_spearman_rho: the joint-cell 2×average-rank deviations sum
  // to zero EXACTLY (the identity that lets ρ skip the mean
  // subtraction), and the cell form reproduces per-element ranks.
  property("Spearman 2×avg-rank deviations: cell form = per-element, Σ = 0") =
    Prop.forAll(Gen.choose(2, 80).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 15L)))) { vs =>
      val n = vs.length.toLong
      def d2(v: Long): Long = {
        val lt = vs.count(_ < v).toLong; val eq = vs.count(_ == v).toLong
        2 * lt + eq + 1 - (n + 1)
      }
      val perElem = vs.map(d2)
      perElem.sum == 0L && perElem.forall(d => math.abs(d) <= 2 * n)
    }

  // agg_kendall_tau: the cell-grid theta-join concordance counts
  // equal the brute-force pairwise definition, and the tau-b
  // normalizer's tie algebra is consistent (C + D + tied-pairs
  // partition all n0 pairs).
  property("Kendall grid concordance equals the pairwise definition") =
    Prop.forAll(Gen.choose(2, 50).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 5L))))) { pts =>
      val cells = pts.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq
      val gridC = (for (((xa, ya), ca) <- cells; ((xb, yb), cb) <- cells
        if xa < xb && ya < yb) yield ca * cb).sum
      val gridD = (for (((xa, ya), ca) <- cells; ((xb, yb), cb) <- cells
        if xa < xb && ya > yb) yield ca * cb).sum
      val idx = pts.zipWithIndex
      val bruteC = (for ((a, i) <- idx; (b, j) <- idx if i < j)
        yield if ((a._1 < b._1 && a._2 < b._2)
          || (b._1 < a._1 && b._2 < a._2)) 1L else 0L).sum
      val bruteD = (for ((a, i) <- idx; (b, j) <- idx if i < j)
        yield if ((a._1 < b._1 && a._2 > b._2)
          || (b._1 < a._1 && b._2 > a._2)) 1L else 0L).sum
      val n = pts.length.toLong
      val n0 = n * (n - 1) / 2
      val tiedX = (for ((a, i) <- idx; (b, j) <- idx
        if i < j && a._1 == b._1) yield 1L).sum
      val tiedY = (for ((a, i) <- idx; (b, j) <- idx
        if i < j && a._2 == b._2) yield 1L).sum
      val tiedBoth = (for ((a, i) <- idx; (b, j) <- idx
        if i < j && a == b) yield 1L).sum
      (gridC == bruteC) :| s"C grid $gridC != brute $bruteC" &&
        (gridD == bruteD) :| s"D grid $gridD != brute $bruteD" &&
        (gridC + gridD + tiedX + tiedY - tiedBoth == n0) :|
          "C + D + ties must partition the n0 pairs"
    }

  // agg_anova_f: the sufficient-statistic split reproduces the SS
  // partition identity SSB + SSW = SST within whole-unit rounding
  // (each group's sx²/n term is floor-quantized to ≤ 0.5 units).
  property("ANOVA sufficient-statistic SSB/SSW track the direct partition") =
    Prop.forAll(Gen.choose(2, 6).flatMap(k => Gen.listOfN(k,
        Gen.choose(2, 30).flatMap(n => Gen.listOfN(n,
          Gen.choose(0L, 2000L)))))) { groups =>
      val all = groups.flatten
      val n = all.length.toDouble
      val grand = all.sum.toDouble / n
      val directSsb = groups.map(g =>
        g.length * math.pow(g.sum.toDouble / g.length - grand, 2)).sum
      val directSsw = groups.map(g => {
        val m = g.sum.toDouble / g.length
        g.map(x => math.pow(x - m, 2)).sum
      }).sum
      val tU = groups.map(g => math.floor(
        g.sum.toDouble * g.sum.toDouble / g.length + 0.5)).sum
      val ssb = tU - all.sum.toDouble * all.sum.toDouble / n
      val ssw = all.map(x => x.toDouble * x).sum - tU
      val tol = 0.5 * (groups.length + 1)
      (math.abs(ssb - directSsb) <= tol) :|
        s"SSB $ssb vs direct $directSsb" &&
        (math.abs(ssw - directSsw) <= tol) :|
          s"SSW $ssw vs direct $directSsw"
    }

  // agg_welch_t: grid sufficient statistics reproduce the
  // per-element mean and sample variance exactly (the only floats
  // are the final divisions, identical in both forms).
  property("Welch sufficient statistics equal per-element mean/variance") =
    Prop.forAll(Gen.choose(2, 60).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 100L)))) { xs =>
      val n = xs.length.toDouble
      val cells = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val sx = cells.map { case (v, c) => c * v }.sum
      val sxx = cells.map { case (v, c) => c * v * v }.sum
      val mGrid = sx.toDouble / n
      val vGrid = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
      val mDirect = xs.sum.toDouble / n
      val vDirect = xs.map(x =>
        (x - mDirect) * (x - mDirect)).sum / (n - 1)
      (mGrid == mDirect) :| "means differ" &&
        (math.abs(vGrid - vDirect) <= 1e-6 * math.max(1.0, vDirect)) :|
          s"variance grid $vGrid vs direct $vDirect"
    }

  // ts_pacf: on an exact AR(1)-shaped ACF (r, r², r³) the
  // Durbin–Levinson φ22 vanishes up to the micro-quantization of the
  // inputs — the algebraic "higher lags add nothing" anchor.
  property("PACF φ22 vanishes on AR(1)-shaped quantized ACFs") =
    Prop.forAll(Gen.choose(-900000L, 900000L)) { r1u =>
      val M = 1000000L
      val r2u = math.floor(r1u.toDouble * r1u / M + 0.5).toLong
      val den22 = M * M - r1u * r1u
      val p22u = math.floor(
        (r2u * M - r1u * r1u).toDouble / den22 * M + 0.5).toLong
      math.abs(p22u) <= 3
    }

  // agg_cohens_d: the grid sufficient-statistic pooled variance
  // equals the direct two-sample pooled variance, and d's relation
  // to the pooled-t statistic t = d·√(n1·n2/N) holds on the same
  // numbers (the classical identity the effect size is defined by).
  property("Cohen's d pooled variance and t-identity from grid stats") =
    Prop.forAll(Gen.zip(
        Gen.choose(2, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 50L))),
        Gen.choose(2, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 50L)))))
      { case (as, bs) =>
        def ss(xs: Seq[Long]): Double = {
          val m = xs.sum.toDouble / xs.length
          xs.map(x => (x - m) * (x - m)).sum
        }
        val (na, nb) = (as.length.toDouble, bs.length.toDouble)
        def stats(xs: Seq[Long]): (Long, Long) =
          (xs.sum, xs.map(x => x * x).sum)
        val (sxa, sxxa) = stats(as); val (sxb, sxxb) = stats(bs)
        val ssA = sxxa.toDouble - sxa.toDouble * sxa / na
        val ssB = sxxb.toDouble - sxb.toDouble * sxb / nb
        val sp2 = (ssA + ssB) / (na + nb - 2)
        val sp2Direct = (ss(as) + ss(bs)) / (na + nb - 2)
        val ok1 = math.abs(sp2 - sp2Direct) <=
          1e-6 * math.max(1.0, sp2Direct)
        val ok2 = if (sp2 > 1e-9) {
          val d = (sxb / nb - sxa / na) / math.sqrt(sp2)
          val t = (sxb / nb - sxa / na) /
            math.sqrt(sp2 * (1 / na + 1 / nb))
          math.abs(t - d * math.sqrt(na * nb / (na + nb))) <=
            1e-6 * math.max(1.0, math.abs(t))
        } else true
        ok1 :| s"sp2 $sp2 vs direct $sp2Direct" && ok2 :| "t != d·√(n1n2/N)"
      }

  // ts_runs_test: the lag-change run count equals an independent
  // block-segmentation count, and the doubled-median sign split
  // drops exactly the equal-to-median elements.
  property("runs count equals block segmentation under the doubled median") =
    Prop.forAll(Gen.choose(3, 80).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 6L)))) { xs =>
      val sorted = xs.sorted
      val h = xs.length
      val med2 = sorted((h + 1) / 2 - 1) + sorted((h + 2) / 2 - 1)
      val signs = xs.map(x => java.lang.Long.signum(2 * x - med2))
        .filter(_ != 0)
      val lagRuns = if (signs.isEmpty) 0
        else 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
      val blockRuns = signs.foldLeft((0, 0)) { case ((runs, prev), s) =>
        if (s != prev) (runs + 1, s) else (runs, s)
      }._1
      val dropped = xs.count(x => 2 * x == med2)
      (lagRuns == blockRuns) :| s"lag $lagRuns vs blocks $blockRuns" &&
        (signs.length + dropped == h) :| "sign split must partition"
    }

  // ts_spectral_peak: (a) each micro-quantized basis row sums to
  // ~0 over a full period (orthogonality survives quantization to
  // ≤ half a unit per entry); (b) the key's amplitude estimator
  // recovers a planted cosine's amplitude over whole periods.
  property("spectral basis quantization keeps orthogonality and recovers amplitude") =
    Prop.forAll(Gen.zip(Gen.oneOf(12, 24, 168), Gen.choose(5L, 60L),
        Gen.choose(2, 4))) { case (t, amp, reps) =>
      val cosU = (0 until t).map(k =>
        math.floor(math.cos(2 * math.Pi * k / t) * 1000000 + 0.5).toLong)
      val sinU = (0 until t).map(k =>
        math.floor(math.sin(2 * math.Pi * k / t) * 1000000 + 0.5).toLong)
      val h = t * reps
      val xs = (0 until h).map(k => 100 +
        math.floor(amp * math.cos(2 * math.Pi * k / t) + 0.5).toLong)
      val total = xs.sum
      val dev = xs.map(_ * h - total)
      val sc = dev.zipWithIndex.map { case (d, k) => d * cosU(k % t) }.sum
      val ss = dev.zipWithIndex.map { case (d, k) => d * sinU(k % t) }.sum
      val est = math.sqrt(sc.toDouble * sc + ss.toDouble * ss) * 2 /
        (h.toDouble * h * 1000000.0)
      (math.abs(cosU.sum) <= t && math.abs(sinU.sum) <= t) :|
        "quantized basis must stay near-orthogonal to the constant" &&
        (math.abs(est - amp) <= 1.0 + 0.02 * amp) :|
          s"amplitude estimate $est vs planted $amp"
    }

  // graph_reciprocity: the reversed-join mutual count equals twice
  // the number of unordered pairs present in both directions (edges
  // distinct, no self-loops).
  property("reciprocity mutual count is twice the mutual unordered pairs") =
    Prop.forAll(Gen.choose(1, 60).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0, 8), Gen.choose(0, 8))))) { raw =>
      val edges = raw.filter(p => p._1 != p._2).distinct
      val eset = edges.toSet
      val mutual = edges.count(e => eset((e._2, e._1)))
      val pairs = edges.filter(e => e._1 < e._2)
        .count(e => eset((e._2, e._1)))
      mutual == 2 * pairs
    }

  // agg_contingency_stdres: expected margins reproduce observed
  // margins exactly, and on a 2×2 table all four adjusted residuals
  // have the same magnitude (the classical single-df identity).
  property("contingency expecteds keep margins; 2x2 adj residuals agree") =
    Prop.forAll(Gen.listOfN(4, Gen.choose(1L, 50L))) { cs =>
      val Seq(a, b, c, d) = cs
      val n = (a + b + c + d).toDouble
      val rows = Seq(a + b, c + d); val cols = Seq(a + c, b + d)
      val obs = Seq(Seq(a, b), Seq(c, d))
      val e = for (i <- 0 to 1; j <- 0 to 1)
        yield rows(i) * cols(j) / n
      val margOk = (0 to 1).forall(i =>
        math.abs(e(2 * i) + e(2 * i + 1) - rows(i)) < 1e-9 * n)
      val adj = for (i <- 0 to 1; j <- 0 to 1) yield {
        val eij = rows(i) * cols(j) / n
        val den2 = eij * (1 - rows(i) / n) * (1 - cols(j) / n)
        if (den2 > 0) (obs(i)(j) - eij) / math.sqrt(den2) else 0.0
      }
      val mags = adj.map(math.abs)
      margOk :| "expected margins must equal observed margins" &&
        (mags.max - mags.min <= 1e-9 * (1 + mags.max)) :|
          s"2x2 adjusted residuals must share magnitude: $adj"
    }

  // agg_mutual_information: MI = H_row + H_col − H_joint on exact
  // doubles, MI ≥ 0, and NMI ≤ 1 (within fp slack) on random tables.
  property("MI equals the entropy identity and NMI stays in [0,1]") =
    Prop.forAll(Gen.choose(2, 4).flatMap(r => Gen.choose(2, 4).flatMap(c =>
        Gen.listOfN(r * c, Gen.choose(0L, 30L)).map(xs => (r, c, xs))))
      .suchThat { case (_, _, xs) => xs.sum > 0 }) { case (r, c, xs) =>
      val n = xs.sum.toDouble
      def h(ps: Seq[Double]): Double =
        ps.filter(_ > 0).map(p => -p * math.log(p)).sum
      val cells = xs.zipWithIndex.map { case (v, i) =>
        (i / c, i % c, v) }.filter(_._3 > 0)
      val rowM = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      val colM = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      val mi = cells.map { case (i, j, v) =>
        (v / n) * math.log(n * v / (rowM(i).toDouble * colM(j))) }.sum
      val hr = h(rowM.values.map(_ / n).toSeq)
      val hc = h(colM.values.map(_ / n).toSeq)
      val hj = h(cells.map(_._3 / n))
      val idOk = math.abs(mi - (hr + hc - hj)) <= 1e-9 * (1 + hr + hc)
      val nmiOk = if (math.min(hr, hc) > 1e-12)
        mi / math.min(hr, hc) <= 1 + 1e-9 else true
      idOk :| s"MI $mi != Hr+Hc-Hj ${hr + hc - hj}" &&
        (mi >= -1e-9) :| "MI must be non-negative" &&
        nmiOk :| "NMI must stay at or below 1"
    }

  // events_markov_stationary: the integer micro-unit iteration (a
  // pure-Scala replica) conserves mass up to DIV rounding every
  // round, and the uniform chain is an exact fixpoint.
  property("Markov micro-iteration conserves mass; uniform chain is a fixpoint") =
    Prop.forAll(Gen.choose(2, 5).flatMap(k => Gen.listOfN(k * k,
        Gen.choose(0L, 20L)).map(xs => (k, xs)))
      .suchThat { case (k, xs) =>
        (0 until k).forall(i => (0 until k).map(j => xs(i * k + j)).sum > 0)
      }) { case (k, xs) =>
      def rowTot(i: Int) = (0 until k).map(j => xs(i * k + j)).sum
      val pU = Array.tabulate(k, k)((i, j) =>
        xs(i * k + j) * 1000000L / rowTot(i))
      var pi = Array.fill(k)(1000000L / k)
      var massOk = true
      for (_ <- 1 to 3) {
        val raw = Array.tabulate(k)(t =>
          (0 until k).map(f => pi(f) * pU(f)(t)).sum)
        val tot = raw.sum
        pi = raw.map(r => if (tot > 0) r * 1000000L / tot else 0L)
        massOk &&= pi.sum <= 1000000L && pi.sum >= 1000000L - k
      }
      val uniP = Array.tabulate(k, k)((_, _) => 1000000L / k)
      var uPi = Array.fill(k)(1000000L / k)
      for (_ <- 1 to 3) {
        val raw = Array.tabulate(k)(t =>
          (0 until k).map(f => uPi(f) * uniP(f)(t)).sum)
        val tot = raw.sum
        uPi = raw.map(r => r * 1000000L / tot)
      }
      massOk :| "renormalized mass must stay within K units of 1e6" &&
        (uPi.toSeq == Seq.fill(k)(1000000L / k).map(identity)) :|
          s"uniform chain must be a fixpoint, got ${uPi.toSeq}"
    }

  // vec_hyperplane_lsh: quantized sign bits are invariant under
  // positive scaling (away from the ±1-unit quantization boundary)
  // and complementary under negation.
  property("SRP sign bits: scale-invariant off-boundary, complementary under -v") =
    Prop.forAll(Gen.zip(
        Gen.listOfN(8, Gen.choose(-10000, 10000)
          .suchThat(d => math.abs(d) >= 2)),
        Gen.choose(11, 29).map(_ / 10.0))) { case (dotsE4, scale) =>
      def bit(d: Double): Int =
        if (math.floor(d * 10000 + 0.5) > 0) 1 else 0
      val dots = dotsE4.map(_ / 10000.0)
      val scaleOk = dots.forall(d => bit(d) == bit(d * scale))
      val negOk = dots.forall(d =>
        bit(d) + bit(-d) == (if (math.floor(d * 10000 + 0.5) == 0
          && math.floor(-d * 10000 + 0.5) == 0) 0 else 1))
      scaleOk :| "sign bit must survive positive scaling off-boundary" &&
        negOk :| "bits of v and -v must be complementary off zero"
    }

  // sample_neyman_allocation: Hamilton apportionment of the Neyman
  // weights is exact (Σ alloc = B) and proportional within one unit
  // of the real-valued quota.
  property("Neyman apportionment sums to budget, within 1 of real quota") =
    Prop.forAll(Gen.zip(Gen.choose(100L, 100000L),
        Gen.choose(2, 8).flatMap(k =>
          Gen.listOfN(k, Gen.choose(1L, 5000L))))) { case (b, ws) =>
      val wTot = ws.sum
      val base = ws.map(w => b * w / wTot)
      val rem = ws.map(w => b * w % wTot)
      val leftover = (b - base.sum).toInt
      val order = rem.zipWithIndex
        .sortBy { case (r, i) => (-r, i) }.map(_._2).take(leftover).toSet
      val alloc = base.zipWithIndex.map { case (q, i) =>
        q + (if (order(i)) 1L else 0L) }
      val propOk = alloc.zip(ws).forall { case (a, w) =>
        math.abs(a - b.toDouble * w / wTot) <= 1.0 }
      (alloc.sum == b) :| s"sum ${alloc.sum} != budget $b" &&
        propOk :| "each allocation must sit within 1 of its real quota"
    }

  // multimodal_aspect_bucket: the 720ths integer ratio is invariant
  // under common scaling of (w, h) — the same image at 2x resolution
  // lands in the same bucket — and every anchor is itself exact.
  property("aspect 720ths ratio scale-invariant; anchors exact") =
    Prop.forAll(Gen.zip(Gen.choose(1L, 4000L), Gen.choose(1L, 4000L),
        Gen.choose(2L, 7L))) { case (w, h, k) =>
      val anchors = Seq((9L, 16L, 405L), (3L, 4L, 540L), (1L, 1L, 720L),
        (4L, 3L, 960L), (16L, 9L, 1280L))
      val anchorOk = anchors.forall { case (aw, ah, u) =>
        aw * 720 / ah == u && (aw * 720) % ah == 0 }
      ((w * 720) / h == (w * k * 720) / (h * k)) :|
        "integer ratio must be scale-invariant" &&
        anchorOk :| "all five anchors must be exact multiples of 720ths"
    }

  // text_conditional_entropy: H(w2|w1) = H(bigram) − H(first-token
  // marginal) on exact doubles, and 0 ≤ H ≤ ln(#distinct followers).
  property("conditional entropy obeys the chain rule and its bounds") =
    Prop.forAll(Gen.choose(2, 60).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 5)))) { toks =>
      val bigrams = toks.zip(toks.tail)
      val n = bigrams.length.toDouble
      def h(counts: Iterable[Int]): Double =
        counts.filter(_ > 0)
          .map(c => -(c / n) * math.log(c / n)).sum
      val bc = bigrams.groupBy(identity).view.mapValues(_.size)
      val mc = bigrams.groupBy(_._1).view.mapValues(_.size)
      val cond = bc.map { case ((w1, _), cb) =>
        cb * math.log(mc(w1).toDouble / cb) }.sum / n
      val chain = h(bc.values) - h(mc.values)
      val maxFollow = bc.keys.map(_._2).toSet.size
      (math.abs(cond - chain) <= 1e-9 * (1 + h(bc.values))) :|
        s"chain rule: $cond vs $chain" &&
        (cond >= -1e-9) :| "conditional entropy must be non-negative" &&
        (cond <= math.log(maxFollow.toDouble.max(1.0)) + 1e-9) :|
          "conditional entropy must not exceed ln(#followers)"
    }

  // ts_mann_kendall: anchor cases + tie-variance non-negativity.
  property("Mann-Kendall S: monotone series saturate, ties only shrink Var") =
    Prop.forAll(Gen.choose(2, 60).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0L, 10L)))) { vs =>
      val n = vs.length.toLong
      def s(series: List[Long]): Long =
        (for (i <- series.indices; j <- i + 1 until series.length)
          yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      val inc = vs.sorted.zipWithIndex.map { case (v, i) => v + 3 * i }
      val tieTerm = vs.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) })
        .sum
      val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
      s(inc) == n * (n - 1) / 2 &&
        s(List.fill(vs.length)(7L)) == 0L &&
        varNum >= 0 && math.abs(s(vs)) <= n * (n - 1) / 2
    }

  // events_survival_km: the micro-nat-quantized exp(Σ ln) form
  // tracks the direct product within quantization tolerance and is
  // non-increasing.
  property("Kaplan-Meier quantized log-sum tracks the direct product") =
    Prop.forAll(Gen.choose(1, 50).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.choose(0L, 30L), Gen.oneOf(0, 1))))) {
      durs =>
      val byT = durs.groupBy(_._1).toList.sortBy(_._1)
      val nTot = durs.length.toLong
      var atRisk = nTot
      var cum = 0L
      var direct = 1.0
      var prev = 2.0
      var ok = true
      byT.foreach { case (_, g) =>
        val d = g.count(_._2 == 1).toLong
        val c = g.count(_._2 == 0).toLong
        if (d > 0) {
          if (atRisk == d) { direct = 0.0; cum = Long.MinValue / 2 }
          else {
            cum += math.floor(math.log((atRisk - d).toDouble / atRisk)
              * 1000000 + 0.5).toLong
            direct *= (atRisk - d).toDouble / atRisk
          }
          val closed = if (cum < -1000000L * 100) 0.0
            else math.exp(cum / 1000000.0)
          ok &&= math.abs(closed - direct) <= 1e-3
          ok &&= closed <= prev + 1e-9
          prev = closed
        }
        atRisk -= d + c
      }
      ok
    }

  // privacy_suppression_curve: suppression cost is monotone in k.
  property("suppression curve is monotone non-decreasing in k") =
    Prop.forAll(Gen.choose(1, 100).flatMap(n =>
        Gen.listOfN(n, Gen.choose(1L, 30L)))) { gs =>
      val ks = List(2L, 5L, 10L, 20L)
      val cost = ks.map(k => gs.filter(_ < k).sum)
      cost == cost.sorted
    }

  // text_js_divergence: the vocabulary-shaped form (present-token
  // terms + the (1 − Σq)·ln2 closure for absent tokens) equals the
  // full-union textbook JSD, and stays within [0, ln 2].
  property("JSD closure form equals the full-union definition") =
    Prop.forAll(Gen.choose(1, 20).flatMap(n =>
        Gen.zip(Gen.listOfN(n, Gen.choose(0L, 50L)),
                Gen.listOfN(n, Gen.choose(0L, 50L))))) { case (as0, bs0) =>
      // P must be a real distribution — plant one guaranteed token
      val as = 1L :: as0
      val bs = 0L :: bs0
      val (na, nb) = (as.sum, bs.sum)
      val nAll = na + nb
      def h(p: Double, q: Double): Double =
        (if (p > 0) p * math.log(2 * p / (p + q)) else 0.0) +
          (if (q > 0) q * math.log(2 * q / (p + q)) else 0.0)
      // P = dist of sample A; Q = pooled corpus dist
      val pooled = as.zip(bs).map { case (a, b) => a + b }
      val full = as.indices.map { i =>
        h(as(i).toDouble / na, pooled(i).toDouble / nAll)
      }.sum / 2
      // closure form: only indices where A is present, plus the
      // absent-mass term
      val present = as.indices.filter(as(_) > 0)
      val sumQ = present.map(pooled(_).toDouble / nAll).sum
      val closure = (present.map { i =>
        h(as(i).toDouble / na, pooled(i).toDouble / nAll)
      }.sum + (1.0 - sumQ) * math.log(2.0)) / 2
      (math.abs(full - closure) < 1e-9) :| s"full=$full closure=$closure" &&
        (closure >= -1e-12 && closure <= math.log(2.0) + 1e-12) :|
          s"out of [0, ln2]: $closure"
    }

  // sample_bootstrap_ci: the Poisson(1) inverse-CDF ladder is a real
  // Poisson — thresholds strictly increase and the expected weight
  // over a uniform grid is 1 within the cap's truncation error.
  property("Poisson(1) inverse-CDF ladder has unit mean on the uniform grid") =
    Prop.forAll(Gen.const(())) { _ =>
      val thr = List(0.3678794412, 0.7357588823, 0.9196986029,
        0.9810118431, 0.9963401532, 0.9994058152, 0.9999167589,
        0.9999897508)
      def w(u: Double): Int = thr.indexWhere(u < _) match {
        case -1 => 8; case i => i
      }
      val grid = (0 until 100000).map(i => (i + 0.5) / 100000.0)
      val mean = grid.map(w).sum.toDouble / grid.length
      thr == thr.sorted && thr.distinct == thr &&
        (math.abs(mean - 1.0) < 0.005) :| s"mean drifted: $mean"
    }

  // variantUnitCells (r11 fix): the whole-unit grid value is now
  // IEEE floor(sum_u/1e6) in BOTH engines. Property: on doubles it
  // equals the exact mathematical floor for both signs across the
  // realistic µ-sum range (exact while |sum_u| < 2^53), i.e. it is
  // engine-independent — and on negative non-exact quotients it
  // DIFFERS from truncating division (Spark `DIV`), which is exactly
  // the latent r10 divergence this fix removes.
  private val microSum: Gen[Long] = Gen.oneOf(
    Gen.choose(-4000000000000000L, 4000000000000000L),
    Gen.choose(-3000000L, 3000000L),
    Gen.oneOf(-1000000L, -1L, 0L, 1L, 999999L, 1000000L, -999999L,
      -1000001L, 1000001L))

  property("variant grid quantizer: IEEE floor(x/1e6) = exact floor, both signs") =
    Prop.forAll(microSum) { su =>
      val ieee = math.floor(su.toDouble / 1000000.0).toLong
      val exact = Math.floorDiv(su, 1000000L)
      val trunc = su / 1000000L // Spark DIV / toward-zero semantics
      (ieee == exact) :| s"IEEE $ieee != floorDiv $exact for $su" &&
        (su >= 0 || su % 1000000L == 0 || trunc == exact + 1) :|
          s"negative non-exact quotient must be where DIV diverged: $su"
    }

  // events_logrank: the micro-quantized grid statistic's defining
  // identities. Single-variant: every at-risk set is wholly group 1,
  // so each E term is EXACTLY d_t (e_u = d_t·1e6, no quantization
  // error) and every variance term is exactly 0 — O1 = E1, V = 0
  // (⇒ the key's NULL-z guard is the only correct readout). Label
  // swap: (O−E) negates and V is invariant up to 1 µ-unit of
  // quantization per time point.
  private val survivors: Gen[List[(Int, Int, Int)]] =
    Gen.choose(2, 80).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 20), Gen.choose(0, 1), Gen.choose(0, 1))))

  private def logrankSums(subj: List[(Int, Int, Int)], g1Label: Int)
      : (Long, Long, Long) = {
    val times = subj.map(_._1).distinct.sorted
    var o1 = 0L; var e1u = 0L; var vu = 0L
    times.foreach { t =>
      val atRisk = subj.filter(_._1 >= t)
      val n = atRisk.size.toLong
      val n1 = atRisk.count(_._3 == g1Label).toLong
      val deaths = subj.filter(s => s._1 == t && s._2 == 1)
      val d = deaths.size.toLong
      val d1 = deaths.count(_._3 == g1Label).toLong
      if (d > 0) {
        o1 += d1
        e1u += math.floor(
          d.toDouble * n1.toDouble / n.toDouble * 1000000 + 0.5).toLong
        if (n > 1) vu += math.floor(d.toDouble
          * (n1.toDouble / n.toDouble)
          * (1.0 - n1.toDouble / n.toDouble)
          * (n - d).toDouble / (n - 1).toDouble * 1000000 + 0.5).toLong
      }
    }
    (o1, e1u, vu)
  }

  property("log-rank: single-variant gives O1 = E1 exactly and V = 0") =
    Prop.forAll(survivors) { subj0 =>
      val subj = subj0.map { case (t, e, _) => (t, e, 1) }
      val (o1, e1u, vu) = logrankSums(subj, 1)
      (e1u == o1 * 1000000L) :| s"E1 $e1u != O1·1e6 ${o1 * 1000000L}" &&
        (vu == 0L) :| s"V must vanish, got $vu"
    }

  property("log-rank: label swap negates O−E and keeps V, within 1µ/time") =
    Prop.forAll(survivors) { subj =>
      val nTimes = subj.filter(_._2 == 1).map(_._1).distinct.size.toLong
      val (o1, e1u, v1) = logrankSums(subj, 1)
      val (o0, e0u, v0) = logrankSums(subj, 0)
      val s1 = o1 * 1000000L - e1u
      val s0 = o0 * 1000000L - e0u
      (math.abs(s1 + s0) <= nTimes) :| s"antisymmetry broke: $s1 + $s0" &&
        (math.abs(v1 - v0) <= nTimes) :| s"V asymmetric: $v1 vs $v0"
    }

  // ts_ses_backtest: the ×128 tap table IS the α = 1/2 SES recursion
  // unrolled (w_i = α(1−α)^{i−1}, tail mass folded into tap 8), so
  // the weights sum to exactly 1 and a locally-constant series
  // forecasts itself exactly (sMAPE term 0).
  property("SES ×128 taps equal the unrolled recursion and sum to 1") =
    Prop.forAll(Gen.choose(1L, 1000000L)) { c =>
      val taps = List(64L, 32L, 16L, 8L, 4L, 2L, 1L, 1L)
      val recursion = (1 to 7).map(i =>
        math.round(128 * 0.5 * math.pow(0.5, i - 1))).toList :+
        math.round(128 * math.pow(0.5, 7))
      val fc128 = taps.map(_ * c).sum
      (taps == recursion) :| s"taps $taps != recursion $recursion" &&
        (taps.sum == 128L) :| "weights must sum to exactly 1" &&
        (fc128 == 128L * c) :| s"constant series must forecast itself"
    }

  // ts_holt_backtest: the ×4^11 tap table IS Holt α = β = 1/2 with
  // (l = oldest window obs, b = 0) init run over the trailing 12
  // points. All quantities are binary fractions with ≤ 52 mantissa
  // bits, so the double recursion is EXACT and the comparison needs
  // no tolerance. Taps sum to 4^11 ⇒ a constant series forecasts
  // itself; and on a planted linear trend Holt's sMAPE beats the
  // seasonal-naive lag-168 forecast (the capability the key exists
  // to add over ts_snaive_smape / ts_ses_backtest).
  private val holtTaps = List(3145728L, 1835008L, 720896L, -16384L,
    -380928L, -467968L, -394496L, -259136L, -126672L, -28772L,
    27371L, 139657L)

  property("Holt ×4^11 taps equal the level+trend recursion and sum to 1") =
    Prop.forAll(Gen.listOfN(12, Gen.choose(1L, 1000L))) { ys =>
      // ys.head is the window seed y_{h-12}; ys.last is y_{h-1}
      var l = ys.head.toDouble
      var b = 0.0
      ys.tail.foreach { y =>
        val lp = l
        l = y / 2.0 + (l + b) / 2.0
        b = (l - lp) / 2.0 + b / 2.0
      }
      val fcRec = l + b
      val fcTap = (1 to 12).map(j => holtTaps(j - 1) * ys(12 - j)).sum /
        4194304.0
      (holtTaps.sum == 4194304L) :| "taps must sum to exactly 4^11" &&
        (fcRec == fcTap) :| s"recursion $fcRec != taps $fcTap"
    }

  property("Holt backtest beats seasonal-naive on a planted linear trend") =
    Prop.forAll(Gen.choose(1L, 50L), Gen.choose(100L, 1000L)) { (slope, base) =>
      val ys = (0 until 400).map(t => (base + slope * t).toDouble)
      def smape(a: Double, f: Double) =
        2 * math.abs(a - f) / (math.abs(a) + math.abs(f))
      val hs = (200 until 400).map { t =>
        smape(ys(t),
          (1 to 12).map(j => holtTaps(j - 1) * ys(t - j)).sum / 4194304.0)
      }
      val ss = (200 until 400).map(t => smape(ys(t), ys(t - 168)))
      (hs.sum < ss.sum) :|
        s"holt ${hs.sum / hs.size} must beat snaive ${ss.sum / ss.size}"
    }

  // ts_holtwinters_backtest: 25 taps = snaive tap (+4^11 at lag 168)
  // plus the Holt taps (+w_j at lag j, −w_j at lag 168+j). The
  // 12-step trailing-window triple recursion at seasonal lag 168
  // never READS an in-window seasonal update (12 < 168), so the
  // taps are the exact unroll. Sum = 4^11 ⇒ constant series
  // self-forecasts; a planted trend+seasonal series has CONSTANT
  // lag-168 differences, which the Holt taps forecast exactly ⇒
  // HW error is 0 while snaive eats the trend and Holt eats the
  // seasonal swing.
  private def hwForecast(ys: Int => Double, t: Int): Double =
    ys(t - 168) +
      (1 to 12).map(j => holtTaps(j - 1) *
        (ys(t - j) - ys(t - 168 - j))).sum / 4194304.0

  property("Holt-Winters taps sum to 4^11 and nail a planted trend+seasonal series") =
    Prop.forAll(Gen.choose(1L, 20L), Gen.choose(500L, 2000L),
      Gen.choose(10L, 200L)) { (slope, base, amp) =>
      // The 25 HW taps are (snaive base = 4^11) + holtTaps − holtTaps
      // on the seasonal difference, so the meaningful exactness checks
      // are: the 12 Holt taps themselves sum to 4^11 (each seasonal
      // difference enters with total weight 1), hence the full HW tap
      // set also sums to 4^11.
      val hwTapSum = holtTaps.sum
      def ys(t: Int): Double =
        base + slope * t + amp * math.sin(2 * math.Pi * (t % 168) / 168.0)
      def smape(a: Double, f: Double) =
        2 * math.abs(a - f) / (math.abs(a) + math.abs(f))
      val ts = 200 until 400
      val hw = ts.map(t => smape(ys(t), hwForecast(ys, t))).sum
      val sn = ts.map(t => smape(ys(t), ys(t - 168))).sum
      val ho = ts.map(t => smape(ys(t),
        (1 to 12).map(j => holtTaps(j - 1) * ys(t - j)).sum / 4194304.0)).sum
      (hwTapSum == 4194304L) :| "taps must sum to exactly 4^11" &&
        (hw < sn) :| s"HW $hw must beat snaive $sn on trend+seasonal" &&
        (hw < ho) :| s"HW $hw must beat Holt $ho on trend+seasonal" &&
        (hw < 1e-9 * ts.size) :|
          s"planted trend+seasonal must be forecast exactly: $hw"
    }

  // ts_holtwinters_interval: the 5–95 residual-quantile band covers
  // ≥ 90% − 2 ranks of the in-sample residuals BY CONSTRUCTION (the
  // order statistics bound it), and on a planted trend+seasonal(+
  // deterministic pseudo-noise) series the HW band is CENTERED while
  // snaive's band center carries the full 168·slope trend bias —
  // the alerting-relevant contrast (a biased band pages on every
  // in-trend hour; width alone cannot show this because a constant
  // bias shifts the band without widening it).
  property("HW interval: in-sample coverage by construction, band centered vs snaive bias") =
    Prop.forAll(Gen.choose(1L, 20L), Gen.choose(500L, 2000L),
      Gen.choose(10L, 200L)) { (slope, base, amp) =>
      def ys(t: Int): Double =
        base + slope * t + amp * math.sin(2 * math.Pi * (t % 168) / 168.0) +
          ((t * 7919) % 13).toDouble
      val ts = 200 until 400
      def band(resid: Seq[Double]): (Double, Double) = {
        val s = resid.sorted
        val n = s.size
        (s((n + 1) / 20 - 1), s(19 * (n + 1) / 20 - 1))
      }
      val hwR = ts.map(t => ys(t) - hwForecast(ys, t))
      val snR = ts.map(t => ys(t) - ys(t - 168))
      val (hq5, hq95) = band(hwR)
      val (sq5, sq95) = band(snR)
      val covered = hwR.count(r => r >= hq5 && r <= hq95)
      (covered >= (9 * ts.size) / 10 - 2) :|
        s"in-sample coverage $covered of ${ts.size}" &&
        (math.abs(hq5 + hq95) < math.abs(sq5 + sq95)) :|
          s"HW band center ${(hq5 + hq95) / 2} must be less biased " +
            s"than snaive's ${(sq5 + sq95) / 2}"
    }

  // ts_ar2_backtest: the centered-2×2 Cramer fit over exact lag
  // sufficient stats approximately recovers planted AR(2)
  // coefficients from a noise-driven stationary series, and the
  // fitted one-step forecast beats the SES taps on it (an
  // oscillatory AR(2) is exactly what one-sided exponential
  // smoothing cannot track — the capability the key adds).
  property("AR(2) fit recovers planted coefficients and beats SES on AR(2) data") =
    Prop.forAll(Gen.choose(0L, 1000L)) { seed =>
      val (p1, p2, c) = (1.2, -0.5, 60.0)
      val rnd = new scala.util.Random(seed)
      val ys = Array.iterate((200.0, 200.0), 500) { case (a, b) =>
        (c + p1 * a + p2 * b + (rnd.nextDouble() - 0.5) * 10.0, a)
      }.map(_._1).drop(100)
      val n = ys.length - 2
      val rows = (2 until ys.length).map(t => (ys(t), ys(t - 1), ys(t - 2)))
      val (sy, s1, s2) = (rows.map(_._1).sum, rows.map(_._2).sum,
        rows.map(_._3).sum)
      val s11 = rows.map(r => r._2 * r._2).sum
      val s22 = rows.map(r => r._3 * r._3).sum
      val s12 = rows.map(r => r._2 * r._3).sum
      val s1y = rows.map(r => r._2 * r._1).sum
      val s2y = rows.map(r => r._3 * r._1).sum
      val (cxx1, cxx2, cx12) = (s11 - s1 * s1 / n, s22 - s2 * s2 / n,
        s12 - s1 * s2 / n)
      val (cx1y, cx2y) = (s1y - s1 * sy / n, s2y - s2 * sy / n)
      val det = cxx1 * cxx2 - cx12 * cx12
      val f1 = (cx1y * cxx2 - cx2y * cx12) / det
      val f2 = (cx2y * cxx1 - cx1y * cx12) / det
      val ic = sy / n - f1 * (s1 / n) - f2 * (s2 / n)
      val maeAr = rows.map { case (y, y1, y2) =>
        math.abs(y - (ic + f1 * y1 + f2 * y2)) }.sum / n
      val sesTaps = List(64L, 32L, 16L, 8L, 4L, 2L, 1L, 1L)
      val maeSes = (8 until ys.length).map { t =>
        math.abs(ys(t) -
          (1 to 8).map(j => sesTaps(j - 1) * ys(t - j)).sum / 128.0)
      }.sum / (ys.length - 8)
      (math.abs(f1 - p1) < 0.25) :| s"phi1 $f1 far from planted $p1" &&
        (math.abs(f2 - p2) < 0.25) :| s"phi2 $f2 far from planted $p2" &&
        (maeAr < maeSes) :| s"AR(2) mae $maeAr must beat SES $maeSes"
    }

  // events_ab_sequential: the always-valid p is exp(−running max of
  // max(lnΛ, 0)) — more evidence can only grow the running max, so
  // the p sequence is monotone non-increasing and stays in (0, 1]
  // on ANY cumulative cell stream (the property that makes peeking
  // safe; a refactor that drops the running max breaks this first).
  private val lookStream: Gen[List[(Long, Long, Long, Long)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      for {
        nc <- Gen.choose(0L, 50L); nt <- Gen.choose(0L, 50L)
        sc <- Gen.choose(0L, nc); st <- Gen.choose(0L, nt)
      } yield (nc, nt, sc, st)))

  // agg_sign_test: the quantized ratio-recursion pipeline (micro-
  // quantized ln steps → BIGINT lnC prefix → nano-quantized exp
  // terms → integer tail sums) must reproduce the EXACT binomial
  // two-sided p within its documented quantization slack. The exact
  // reference is BigInt arithmetic — no floats at all.
  property("sign test: quantized recursion matches exact binomial tails") =
    Prop.forAll(Gen.choose(1, 60).flatMap(n =>
        Gen.choose(0, n).map(k => (n, k)))) { case (n, k) =>
      // the pipeline, verbatim in Scala
      val steps = (1 to n).map(j =>
        math.floor(math.log((n - j + 1).toDouble / j) * 1000000 + 0.5)
          .toLong)
      val lnc = steps.scanLeft(0L)(_ + _)
      val terms = (0 to n).map(j => math.floor(
        math.exp((lnc(j) - n * 693147L).toDouble / 1000000.0)
          * 1000000000L + 0.5).toLong)
      val pLe = terms.take(k + 1).sum
      val pGe = terms.drop(k).sum
      val pTwo = math.min(1000000000L, 2L * math.min(pLe, pGe)) / 1.0e9
      // exact reference in BigInt
      def choose(n: Int, j: Int): BigInt =
        (1 to j).foldLeft(BigInt(1))((a, i) => a * (n - i + 1) / i)
      val tot = BigInt(2).pow(n)
      val exLe = (0 to k).map(choose(n, _)).sum
      val exGe = (k to n).map(choose(n, _)).sum
      val exTwo = math.min(1.0,
        2.0 * (exLe.min(exGe)).toDouble / tot.toDouble)
      (math.abs(pTwo - exTwo) < 2e-4) :|
        s"quantized p $pTwo vs exact $exTwo at n=$n k=$k"
    }

  // agg_hodges_lehmann: the weighted lower median over the cell-grid
  // diff table is EXACTLY the lower median of the multiset of all
  // pairwise b−a differences.
  property("Hodges-Lehmann grid median equals brute-force pairwise median") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-20L, 20L)),
        Gen.nonEmptyListOf(Gen.choose(-20L, 20L))) { (as, bs) =>
      val diffs = (for (b <- bs; a <- as) yield b - a).sorted
      // the key's rule 2·cumw ≥ W+1 selects rank ⌈(W+1)/2⌉, i.e.
      // 0-based index ⌊W/2⌋ (the median; upper-middle on even W)
      val brute = diffs(diffs.length / 2)
      // grid form: distinct diffs with weights, cumulative rule
      val grid = diffs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val wtot = grid.map(_._2).sum
      val cum = grid.scanLeft(0L)(_ + _._2).tail
      val hl = grid.zip(cum).collectFirst {
        case ((d, _), c) if c * 2 >= wtot + 1 => d
      }.get
      (hl == brute) :| s"grid $hl vs brute $brute"
    }

  // graph_label_homophily: the integer closed form
  // (4m·S − Σc²)/(4m² − Σc²) equals Newman's categorical
  // assortativity computed from the normalized mixing matrix, and
  // an all-same-label edge list reads exactly 1.
  property("label homophily closed form equals the mixing-matrix definition") =
    Prop.forAll(Gen.nonEmptyListOf(for {
      la <- Gen.choose(0, 3); lb <- Gen.choose(0, 3)
    } yield (la, lb))) { edges =>
      val m = edges.length.toLong
      val same = edges.count { case (a, b) => a == b }.toLong
      val cnt = edges.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sumCSq = cnt.values.map(c => c * c).sum
      val den = 4 * m * m - sumCSq
      // mixing-matrix definition: e_ij over 2m directed ends,
      // a_i marginals; r = (tr e − Σa²)/(1 − Σa²)
      val tr = same.toDouble / m
      val sa2 = cnt.values.map(c => c.toDouble / (2 * m)).map(x => x * x).sum
      (den == 0L) :| "degenerate" || {
        val closed = (4 * m * same - sumCSq).toDouble / den
        val defn = (tr - sa2) / (1.0 - sa2)
        (math.abs(closed - defn) < 1e-9) :| s"closed $closed vs def $defn"
      }
    }

  // agg_hodges_lehmann auto-coarsening (VERDICT r14 #4): regrouping
  // the cell grid on floor(x/f) and rescaling the coarse weighted
  // median by f lands within ONE quantizer step of the fine HL, for
  // any factor f — the contract that makes the domain-bounded grid
  // safe at any raw domain width.
  property("Hodges-Lehmann coarsened median is within one quantizer step of fine") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-500L, 500L)),
        Gen.nonEmptyListOf(Gen.choose(-500L, 500L)),
        Gen.oneOf(1L, 10L, 100L)) { (as, bs, f) =>
      def hl(xs: Seq[Long], ys: Seq[Long]): Long = {
        val diffs = (for (b <- ys; a <- xs) yield b - a).sorted
        diffs(diffs.length / 2)
      }
      val fine = hl(as, bs)
      // the pipeline's coarse form: floor(x/f) per the IEEE rule
      def q(x: Long): Long = math.floor(x.toDouble / f).toLong
      val coarse = hl(as.map(q), bs.map(q)) * f
      (math.abs(coarse - fine) <= f) :|
        s"coarse $coarse vs fine $fine at f=$f"
    }

  // eval_calibration_fit: the minimax closed form
  // fit(k) = max_{i≤k} min_{j≥k} avg(y_i..y_j) over the score grid,
  // with every interval average floored to micro by integer division,
  // equals the classic pool-adjacent-violators algorithm's fit
  // floored to micro — floor is monotone, so it commutes with the
  // extremes, making the grid form EXACTLY floor(1e6·PAVA).
  property("isotonic minimax grid form equals pool-adjacent-violators") =
    Prop.forAll(Gen.nonEmptyListOf(
        Gen.zip(Gen.choose(0L, 12L), Gen.oneOf(0L, 1L)))) { pts =>
      val cells = pts.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, g) => (s, g.map(_._2).sum, g.length.toLong) }
      val m = cells.length
      // classic PAVA: merge adjacent blocks while avg decreases
      // (exact rational compare by cross-multiplication)
      val blocks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int)] // (pos, n, cellCount)
      cells.foreach { case (_, pos, n) =>
        blocks += ((pos, n, 1))
        while (blocks.length > 1 && {
          val a = blocks(blocks.length - 2); val b = blocks.last
          a._1 * b._2 >= b._1 * a._2
        }) {
          val b = blocks.remove(blocks.length - 1)
          val a = blocks.remove(blocks.length - 1)
          blocks += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
      val pava = blocks.flatMap { case (pos, n, c) =>
        Seq.fill(c)(pos * 1000000L / n) }.toSeq
      // minimax grid form (the key's algebra)
      val pref = cells.scanLeft((0L, 0L)) { case ((p, n), (_, pos, cnt)) =>
        (p + pos, n + cnt) }
      def r(i: Int, j: Int): Long =
        (pref(j + 1)._1 - pref(i)._1) * 1000000L /
          (pref(j + 1)._2 - pref(i)._2)
      val minimax = (0 until m).map(k =>
        (0 to k).map(i => (k until m).map(j => r(i, j)).min).max)
      (minimax == pava) :| s"minimax $minimax vs pava $pava"
    }

  // agg_wilcoxon_signed_rank: the doubled-midrank cell-grid 2W⁺
  // equals the textbook W⁺ (midranks of |d|, summed over positive
  // deltas) computed directly — ties and zeros handled per the
  // standard procedure.
  property("Wilcoxon signed-rank grid 2W+ equals brute-force midranks") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-8L, 8L))) { ds0 =>
      val ds = ds0.filter(_ != 0L)
      val byAdev = ds.groupBy(d => math.abs(d)).toSeq.sortBy(_._1)
      // brute: midrank of each |d| tie group in 2× units
      var below = 0L
      var w2Brute = 0L
      byAdev.foreach { case (_, grp) =>
        val t = grp.length.toLong
        val r2 = 2 * below + t + 1 // doubled midrank
        w2Brute += grp.count(_ > 0) * r2
        below += t
      }
      // grid form (the key's algebra)
      var cumLt = 0L
      var w2Grid = 0L
      byAdev.foreach { case (_, grp) =>
        val t = grp.length.toLong
        val np = grp.count(_ > 0).toLong
        w2Grid += np * (2 * cumLt + t + 1)
        cumLt += t
      }
      (w2Grid == w2Brute) :| s"grid $w2Grid vs brute $w2Brute" &&
        (ds.isEmpty || {
          // midrank sum identity: Σ over ALL deltas of r2 = n(n+1)
          val n = ds.length.toLong
          var cum = 0L
          var tot = 0L
          byAdev.foreach { case (_, grp) =>
            val t = grp.length.toLong
            tot += t * (2 * cum + t + 1); cum += t
          }
          tot == n * (n + 1)
        }) :| "midrank-sum identity n(n+1) failed"
    }

  property("mSPRT always-valid p is monotone non-increasing in looks") =
    Prop.forAll(lookStream) { incs0 =>
      val tau2 = 0.0001
      // ScalaCheck shrinking does NOT respect the generator's domain
      // (it once minimized to nc = −1 with sc = 2, i.e. successes
      // exceeding trials, which manufactures impossible θ > 1
      // evidence) — re-clamp to the generator's own invariants so a
      // shrunk counterexample is still a VALID cell stream.
      val incs = incs0.map { case (nc, nt, sc, st) =>
        val (c, t) = (math.max(0L, nc), math.max(0L, nt))
        (c, t, math.min(math.max(0L, sc), c),
          math.min(math.max(0L, st), t))
      }
      val cum = incs.scanLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), i) =>
        (a + i._1, b + i._2, c + i._3, d + i._4)
      }.tail
      val llrU = cum.map { case (nc, nt, sc, st) =>
        if (nc > 0 && nt > 0 && sc + st > 0 && sc + st < nc + nt) {
          val pbar = (sc + st).toDouble / (nc + nt)
          val v = pbar * (1.0 - pbar) * (1.0 / nc + 1.0 / nt)
          val theta = st.toDouble / nt - sc.toDouble / nc
          val llr = 0.5 * math.log(v / (v + tau2)) +
            theta * theta * tau2 / (2.0 * v * (v + tau2))
          Some(math.floor(llr * 1000000 + 0.5).toLong)
        } else None
      }
      val ps = llrU.scanLeft(0L) { (mx, l) =>
        math.max(mx, l.getOrElse(Long.MinValue))
      }.tail.map(mx => math.floor(
        math.exp(-math.max(mx, 0L).toDouble / 1000000.0) * 1000000 + 0.5)
        .toLong)
      val mono = ps.zip(ps.tail).forall { case (a, b) => b <= a }
      // p = 0 is reachable as micro-quantization UNDERFLOW of a
      // legitimate overwhelming-evidence stream (exp(−mx) < 5e-7 at
      // lnΛ > ~14.5) — allow it, but only when the running max is in
      // the underflow regime; any other zero is a real bug.
      val mxs = llrU.scanLeft(0L) { (mx, l) =>
        math.max(mx, l.getOrElse(Long.MinValue))
      }.tail
      mono :| s"p rose under more evidence: $ps" &&
        ps.zip(mxs).forall { case (p, mx) =>
          p <= 1000000 && (p > 0 || mx > 14000000L)
        } :| s"p out of (0,1] without underflow evidence: $ps"
    }

  // sample_weighted_topk: the Efraimidis–Spirakis key u^(1/w) is
  // monotone in w for a fixed uniform (ln u < 0 ⇒ ln(u)/w increases
  // with w), so raising a row's weight NEVER worsens its rank on the
  // same uniforms — the inclusion-monotonicity that makes the top-k
  // a weighted sample. Pinned on the nano-quantized key the engines
  // actually compare.
  property("E-S weighted key is monotone in weight on a fixed uniform") =
    Prop.forAll(Gen.choose(0L, 268435455L),
        Gen.choose(1L, 500000L), Gen.choose(1L, 500000L)) { (u28, w1, w2) =>
      def keyN(w: Long): Long =
        math.floor(math.log((u28 + 1).toDouble / 268435456.0)
          / w * 1000000000 + 0.5).toLong
      val (lo, hi) = (math.min(w1, w2), math.max(w1, w2))
      (keyN(lo) <= keyN(hi)) :|
        s"key fell as weight rose: w=$lo -> ${keyN(lo)}, w=$hi -> ${keyN(hi)}"
    }

  // multimodal_wavelet_hash: the Haar-hash invariants that make it a
  // PERCEPTUAL signature — a constant tile has exactly-zero detail
  // coefficients on every band and every quadrant exactly at the
  // global mean (strict > reads 0 ⇒ whash 0), and the 12 detail
  // bits are DC-shift invariant (each ±1 weight set sums to 0 per
  // quadrant, so adding a constant to every byte cancels exactly).
  property("Haar hash: constant tile is 0; detail bits DC-shift invariant") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(0, 200)),
        Gen.choose(1, 55), Gen.choose(0, 255)) { (px, shift, cv) =>
      import graft.multimodal.Multimodal.waveletHash
      val constant = waveletHash(Array.fill(64)(cv.toByte))
      val base = waveletHash(px.map(_.toByte).toArray)
      val shifted = waveletHash(px.map(v => (v + shift).toByte).toArray)
      (constant == 0L) :| s"constant tile must hash to 0: $constant" &&
        ((base >> 4) == (shifted >> 4)) :|
          s"detail bits moved under DC shift: $base vs $shifted"
    }

  // multimodal_dhash — the gradient hash's two definitional pins: a
  // constant tile has no gradient anywhere (strict > reads 0), and a
  // uniform brightness shift cancels in EVERY difference, so the
  // whole 56-bit hash (not just detail bits) is DC-shift invariant
  // as long as no byte wraps mod 256.
  property("dHash: constant tile is 0; whole hash DC-shift invariant") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(0, 127)),
        Gen.choose(1, 127), Gen.choose(0, 255)) { (px, shift, cv) =>
      import graft.multimodal.Multimodal.dHash
      val constant = dHash(Array.fill(64)(cv.toByte))
      val base = dHash(px.map(_.toByte).toArray)
      val shifted = dHash(px.map(v => (v + shift).toByte).toArray)
      (constant == 0L) :| s"constant tile must hash to 0: $constant" &&
        (base == shifted) :|
          s"gradient bits moved under DC shift: $base vs $shifted"
    }

  // multimodal_ahash — the average hash's definitional pins: a
  // constant tile has no cell strictly above the mean (0), and a
  // uniform non-wrapping byte shift moves every cell AND the mean
  // together, so the whole 63-bit hash is DC-shift invariant. The
  // sign bit (bit 63) is structurally clear.
  property("aHash: constant tile is 0; whole hash DC-shift invariant; sign clear") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(0, 127)),
        Gen.choose(1, 127), Gen.choose(0, 255)) { (px, shift, cv) =>
      import graft.multimodal.Multimodal.aHash
      val constant = aHash(Array.fill(64)(cv.toByte))
      val base = aHash(px.map(_.toByte).toArray)
      val shifted = aHash(px.map(v => (v + shift).toByte).toArray)
      (constant == 0L) :| s"constant tile must hash to 0: $constant" &&
        (base == shifted) :|
          s"mean bits moved under DC shift: $base vs $shifted" &&
        (base >= 0L) :| s"sign bit must stay clear: $base"
    }

  // agg_wilson_ci: the Wilson interval never leaves [0, 1] and always
  // contains the point estimate — the two properties Wald CIs lose at
  // extreme rates / small n, and the reason this key exists.
  property("Wilson CI stays in [0,1] and contains p-hat on any cells") =
    Prop.forAll(Gen.choose(1L, 100000L).flatMap(n =>
        Gen.choose(0L, n).map(x => (n, x)))) { case (n, x) =>
      val z = 1.959964
      val z2 = z * z
      val ph = x.toDouble / n
      val center = (ph + z2 / (2.0 * n)) / (1.0 + z2 / n)
      val half = z * math.sqrt(ph * (1.0 - ph) / n
        + z2 / (4.0 * n.toDouble * n)) / (1.0 + z2 / n)
      val (lo, hi) = (center - half, center + half)
      (lo >= 0.0 && hi <= 1.0) :| s"CI left [0,1]: [$lo, $hi]" &&
        (lo <= ph && ph >= lo && hi >= ph) :| s"CI lost p-hat: [$lo, $hi] vs $ph"
    }

  // agg_eb_shrinkage: (x+α)/(n+α+β) is exactly the convex mix
  // w·raw + (1−w)·priormean with w = n/(n+α+β), so every shrunken
  // rate lies BETWEEN its raw rate and the prior mean — shrinkage
  // can only pull toward the pool, never past it.
  private val ebGroups: Gen[List[(Long, Long)]] =
    Gen.choose(3, 30).flatMap(k => Gen.listOfN(k,
      Gen.choose(1L, 1000L).flatMap(n =>
        Gen.choose(0L, n).map(x => (n, x)))))

  property("EB shrinkage lands between the raw rate and the prior mean") =
    Prop.forAll(ebGroups) { gs =>
      val pu = gs.map { case (n, x) => x * 1000000L / n }
      val k = pu.size
      val m = pu.sum.toDouble / (k * 1000000.0)
      val v = (k.toDouble * pu.map(p => p.toDouble * p).sum
        - pu.sum.toDouble * pu.sum) / (k.toDouble * k * 1.0e12)
      val ok = v > 0 && m > 0 && m < 1 && m * (1.0 - m) > v
      if (!ok) Prop.passed
      else {
        val common = m * (1.0 - m) / v - 1.0
        val alpha = m * common
        val beta = (1.0 - m) * common
        val prior = alpha / (alpha + beta)
        Prop.all(gs.map { case (n, x) =>
          val raw = x.toDouble / n
          val shrunk = (x + alpha) / (n + alpha + beta)
          val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
          (shrunk >= lo - 1e-9 && shrunk <= hi + 1e-9) :|
            s"shrunk $shrunk escaped [$lo, $hi] (raw $raw prior $prior)"
        }: _*)
      }
    }

  // sample_raking_ipf: one integer-DIV row round lands every row
  // marginal within truncation of its uniform target — the invariant
  // that makes 3 alternating rounds converge (each round re-solves
  // its own dimension exactly up to micro truncation).
  private val ipfCells: Gen[List[(Int, Int, Long)]] =
    for {
      nr <- Gen.choose(2, 5); nc <- Gen.choose(2, 5)
      cs <- Gen.listOfN(nr * nc, Gen.choose(1L, 1000L))
    } yield (for (i <- 0 until nr; j <- 0 until nc)
      yield (i, j, cs(i * nc + j))).toList

  property("IPF row round lands row marginals on target up to truncation") =
    Prop.forAll(ipfCells) { cells =>
      val nr = cells.map(_._1).distinct.size
      val tt = cells.map(_._3).sum
      val tgtU = tt * 1000000L / nr
      val w0 = 1000000L
      val rowSum = cells.groupBy(_._1).view
        .mapValues(_.map(c => c._3 * w0).sum).toMap
      val after = cells.map { case (r, _, cnt) =>
        val f = tgtU * 1000000L / rowSum(r)
        (r, cnt * (w0 * f / 1000000L))
      }
      Prop.all(after.groupBy(_._1).toSeq.map { case (r, ms) =>
        val got = ms.map(_._2).sum
        // per-cell weight truncation ≤ 1 micro-unit ⇒ marginal error
        // ≤ Σ cnt of the row (plus the factor's own DIV truncation)
        val bound = cells.filter(_._1 == r).map(_._3).sum * 2 + 1000000L
        (math.abs(got - tgtU) <= bound) :|
          s"row $r marginal $got vs target $tgtU (bound $bound)"
      }: _*)
    }

  // agg_permutation_pvalue: the add-one convention bounds p away
  // from 0 (p ∈ [1/(B+1), 1]) and a ZERO observed difference reads
  // exactly 1 — every permutation's |diff| trivially clears 0, so a
  // null effect can never look significant.
  private val permCells: Gen[(List[(Long, Long, Long)], Int)] =
    for {
      n <- Gen.choose(4, 60)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(-1000L, 1000L)
        t <- Gen.choose(0L, 1L)
        h <- Gen.choose(0L, 268435455L)
      } yield (x, t, h))
    } yield (rows, 32)

  property("permutation p stays in [1/(B+1), 1]; zero diff reads 1") =
    Prop.forAll(permCells) { case (rows, bTot) =>
      val n0 = rows.count(_._2 == 0L); val n1 = rows.count(_._2 == 1L)
      val s0 = rows.filter(_._2 == 0L).map(_._1).sum
      val s1 = rows.filter(_._2 == 1L).map(_._1).sum
      val obsNum = math.abs(s1 * n0 - s0 * n1)
      val obsDen = n1.toLong * n0
      val reps = (0 until bTot).flatMap { b =>
        val arms = rows.map { case (x, _, h) =>
          (x, ((h * (2654435761L + b * 96542L)) % 268435456L) % 2) }
        val (a0, a1) = (arms.filter(_._2 == 0L), arms.filter(_._2 == 1L))
        if (a0.isEmpty || a1.isEmpty) None
        else Some((math.abs(a1.map(_._1).sum * a0.size.toLong
            - a0.map(_._1).sum * a1.size.toLong),
          a1.size.toLong * a0.size))
      }
      if (reps.isEmpty || obsDen == 0) Prop.passed
      else {
        val nGe = reps.count { case (num, den) =>
          num * obsDen >= obsNum * den }
        val pU = (1L + nGe) * 1000000L / (reps.size + 1)
        val inRange = pU >= 1000000L / (reps.size + 1) && pU <= 1000000L
        (inRange :| s"p left its range: $pU") &&
          ((obsNum != 0L || nGe == reps.size) :|
            s"zero observed diff must make every replicate >=: $nGe/${reps.size}")
      }
    }

  // agg_ols_multi: Cramer's rule on the centered 2×2 system IS the
  // least-squares solution — the betas satisfy the normal equations
  // on arbitrary integer data, and when the regressors are exactly
  // uncorrelated (cx12 = 0) each beta collapses to its simple
  // single-regressor slope (the agg_corr_regr reduction).
  private val olsRows: Gen[List[(Long, Long, Long)]] =
    Gen.choose(3, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 10L),
        Gen.choose(0L, 1000L))))

  property("two-regressor Cramer betas satisfy the normal equations") =
    Prop.forAll(olsRows) { rows =>
      val n = rows.size.toDouble
      val s1 = rows.map(_._1).sum.toDouble
      val s2 = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val cxx1 = rows.map(r => r._1.toDouble * r._1).sum - s1 * s1 / n
      val cxx2 = rows.map(r => r._2.toDouble * r._2).sum - s2 * s2 / n
      val cx12 = rows.map(r => r._1.toDouble * r._2).sum - s1 * s2 / n
      val cx1y = rows.map(r => r._1.toDouble * r._3).sum - s1 * sy / n
      val cx2y = rows.map(r => r._2.toDouble * r._3).sum - s2 * sy / n
      val det = cxx1 * cxx2 - cx12 * cx12
      if (det == 0.0) Prop.passed // the key's NULL guard branch
      else {
        val b1 = (cx1y * cxx2 - cx2y * cx12) / det
        val b2 = (cx2y * cxx1 - cx1y * cx12) / det
        val scale = math.max(1.0, math.abs(cx1y) + math.abs(cx2y))
        val eq1 = math.abs(cxx1 * b1 + cx12 * b2 - cx1y) <= 1e-7 * scale
        val eq2 = math.abs(cx12 * b1 + cxx2 * b2 - cx2y) <= 1e-7 * scale
        val reduce = cx12 != 0.0 ||
          (math.abs(b1 - cx1y / cxx1) <= 1e-9 * math.abs(b1).max(1.0) &&
           math.abs(b2 - cx2y / cxx2) <= 1e-9 * math.abs(b2).max(1.0))
        eq1 :| "normal equation 1 violated" &&
          eq2 :| "normal equation 2 violated" &&
          reduce :| "orthogonal regressors must give the simple slopes"
      }
    }

  // agg_bh_fdr: the window step-up (flag each rank, reject ranks ≤
  // max flagged rank) IS the textbook BH rule — the rejection set is
  // exactly the first k* = max{k : p_(k) ≤ k·q/m} order statistics
  // (a PREFIX of the p-sorted tests, even when intermediate ranks
  // fail their own threshold), and every rejected p ≤ p_(k*).
  private val pvals: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.choose(0L, 1000000L)))

  property("BH window step-up equals the textbook rule and rejects a prefix") =
    Prop.forAll(pvals, Gen.choose(1L, 500000L)) { (ps, qMicro) =>
      val m = ps.size.toLong
      val sorted = ps.sorted.zipWithIndex
        .map { case (p, i) => (p, i + 1L) } // (p_(k), k)
      val kStar = sorted.filter { case (p, k) => p * m <= k * qMicro }
        .map(_._2).reduceOption(_ max _)
      val rejected = kStar match {
        case None => Nil
        case Some(k) => sorted.takeWhile(_._2 <= k)
      }
      val textbook = kStar.map(k => sorted.take(k.toInt)).getOrElse(Nil)
      (rejected == textbook) :| "rejection set must be the k* prefix" &&
        rejected.forall { case (p, _) =>
          p <= kStar.map(k => sorted(k.toInt - 1)._1).getOrElse(-1L)
        } :| "every rejected p must be <= p_(k*)"
    }

  // agg_holm_bonferroni: step-down semantics — the rejection set is
  // the maximal prefix where EVERY rank k so far passes
  // p_(k) ≤ α/(m−k+1) — and Holm at α is always CONTAINED in BH at
  // q = α (the classical FWER ⊆ FDR power ordering), because Holm's
  // per-rank threshold α/(m−k+1) ≤ k·α/m for every k ≤ m.
  property("Holm rejects a prefix and is contained in BH at the same level") =
    Prop.forAll(pvals, Gen.choose(1L, 500000L)) { (ps, aMicro) =>
      val m = ps.size.toLong
      val sorted = ps.sorted.zipWithIndex
        .map { case (p, i) => (p, i + 1L) }
      // Holm: first failing rank stops everything after it
      val kStop = sorted.find { case (p, k) =>
        p * (m - k + 1) > aMicro
      }.map(_._2)
      val holm = kStop match {
        case None => sorted
        case Some(k) => sorted.takeWhile(_._2 < k)
      }
      // BH at q = α
      val kStar = sorted.filter { case (p, k) => p * m <= k * aMicro }
        .map(_._2).reduceOption(_ max _)
      val bh = kStar.map(k => sorted.take(k.toInt)).getOrElse(Nil)
      (holm == sorted.takeWhile(h => holm.contains(h))) :|
        "Holm rejection set must be a prefix" &&
        holm.forall(bh.contains) :|
          s"Holm (${holm.size}) must be contained in BH (${bh.size})"
    }

  // dedup_capture_recapture: Chapman's estimator never undercounts
  // the OBSERVED union (N̂ ≥ n_A + n_B − m − 1 in the floored integer
  // form, exact when detectors coincide) and two identical detectors
  // estimate exactly their own population (nothing unseen).
  private val captures: Gen[(Long, Long, Long)] = for {
    m <- Gen.choose(0L, 200L)
    ea <- Gen.choose(0L, 300L)
    eb <- Gen.choose(0L, 300L)
  } yield (m + ea, m + eb, m)

  property("Chapman estimate covers the observed union; identical detectors close") =
    Prop.forAll(captures) { case (na, nb, m) =>
      val nHat = (na + 1) * (nb + 1) / (m + 1) - 1
      val union = na + nb - m
      val identical = (m + 1) * (m + 1) / (m + 1) - 1
      (nHat >= union - 1) :| s"estimate $nHat below union $union" &&
        (identical == m) :| "identical detectors must estimate themselves"
    }

  // multimodal_dct_phash anchors. Every AC basis row sums to EXACTLY
  // zero even after micro-quantization: the 8 cosines pair up as
  // (θ, θ+π) with exact negation, and round(−y) = −round(y) for any
  // non-half-integer y, so quantization preserves the cancellation.
  // Hence a constant tile's F_uv = c·(Σrow_u)·(Σrow_v) = 0 exactly
  // for every AC coefficient ⇒ hash 0 — and by the same row-sum
  // identity the hash is invariant under adding a uniform offset to
  // all bytes (DC shifts never flip frequency sign bits).
  property("DCT pHash: AC rows cancel exactly; constant tiles hash to 0") =
    Prop.forAll(Gen.choose(0, 255), Gen.choose(1, 200),
      Gen.listOfN(64, Gen.choose(0, 127))) { (b, n, tile) =>
      val M = graft.multimodal.Multimodal
      val basis = M.dctBasisMicro
      val rowSumsZero = (1 until 4).forall { u =>
        (0 until 8).map(r => basis(u * 8 + r)).sum == 0L
      }
      val dcRow = (0 until 8).forall(r => basis(r) == 1000000L)
      val constH = M.dctPhash(Array.fill(n)(b.toByte), basis)
      val base = tile.map(_.toByte).toArray
      val shifted = tile.map(x => (x + 100).toByte).toArray
      (rowSumsZero :| "AC basis rows must cancel exactly") &&
        (dcRow :| "DC basis row must be 1e6") &&
        (constH == 0L) :| s"constant tile hashed to $constH" &&
        (M.dctPhash(base, basis) == M.dctPhash(shifted, basis)) :|
          "uniform byte offset must not change the hash"
    }

  // ts_pettitt_test: within-prefix pairs cancel by antisymmetry, so
  // U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i−x_j) = S2_t − t(N+1) where S2 runs
  // over doubled midranks R2(v) = 2·cum<(v) + c(v) + 1 — the identity
  // that turns the O(n²) pair scan into one prefix sum.
  property("Pettitt prefix closed form equals the pairwise sgn definition") =
    Prop.forAll(series) { xs =>
      val n = xs.length
      def r2(v: Long): Long =
        2L * xs.count(_ < v) + xs.count(_ == v) + 1
      val s2 = xs.map(r2).scanLeft(0L)(_ + _).tail
      val closed = (1 to n).map(t => s2(t - 1) - t.toLong * (n + 1))
      val brute = (1 to n).map(t =>
        (for (i <- 0 until t; j <- t until n)
          yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum)
      (closed == brute) :| s"closed $closed != brute $brute"
    }

  // agg_kruskal_wallis's rank source: the doubled grid midrank
  // R2(v) = 2·cum<(v) + c(v) + 1 is exactly twice the average of the
  // 1-based positions value v occupies in the sorted pooled sample —
  // the identity that keeps tied ranks integer on the value grid.
  property("doubled grid midranks equal twice the pooled average rank") =
    Prop.forAll(series) { xs =>
      val withRank = xs.sorted.zipWithIndex
      xs.distinct.forall { v =>
        val pos = withRank.collect { case (x, i) if x == v => i + 1L }
        val r2 = 2L * xs.count(_ < v) + xs.count(_ == v) + 1
        r2 * pos.length == 2L * pos.sum
      } :| "R2 * count must equal 2 * sum(positions)"
    }

  // agg_page_trend: under row-wise permutation exchangeability the
  // exact tie-aware conditional moments of L2 = Σ_j j·R2_j are
  // E = 24 and Var = ΣR2² − 48 PER ROW (k = 3) — proven here by
  // exhaustive enumeration of the 3! assignments, including ties.
  property("Page L2 moments: E=24 and Var=Q4-48 per row, any ties") =
    Prop.forAll(Gen.listOfN(3, Gen.choose(0L, 5L))) { xs =>
      def r2(v: Long): Long = 2L * xs.count(_ < v) + xs.count(_ == v) + 1
      val rs = xs.map(r2)
      val ls = rs.permutations.toList.map(p => p(0) + 2 * p(1) + 3 * p(2))
      val mean = ls.sum.toDouble / ls.size
      val varL = ls.map(l => math.pow(l - mean, 2)).sum / ls.size
      val q4 = rs.map(r => r * r).sum
      (math.abs(mean - 24.0) < 1e-9) :| s"mean $mean != 24" &&
        (math.abs(varL - (q4 - 48.0)) < 1e-9) :|
          s"var $varL != ${q4 - 48}"
    }

  // agg_jonckheere_terpstra: the doubled statistic J2 =
  // Σ_{g<g'} (2·#{x<y} + #{x=y}) over cross-group pairs equals the
  // 2-D dominance prefix Σ_cells c·(2·T_lt + S_eq) over the COMPLETED
  // (group × value) grid — the identity that replaces k² Mann-Whitney
  // passes with two stacked windows.
  property("Jonckheere dominance-prefix form equals the pairwise definition") =
    Prop.forAll(Gen.choose(1, 120).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(-6L, 6L))))) { rows =>
      val brute = (for ((g1, x1) <- rows; (g2, x2) <- rows if g1 < g2)
        yield (if (x1 < x2) 2L else if (x1 == x2) 1L else 0L)).sum
      val cMap = rows.groupBy(identity).map { case (k, l) =>
        (k, l.size.toLong)
      }.withDefaultValue(0L)
      val gs = rows.map(_._1).distinct.sorted
      val vs = rows.map(_._2).distinct.sorted
      def cumlt(g: Long, v: Long): Long =
        vs.filter(_ < v).map(w => cMap((g, w))).sum
      val closed = (for (g <- gs; v <- vs) yield {
        val tLt = gs.filter(_ < g).map(gp => cumlt(gp, v)).sum
        val sEq = gs.filter(_ < g).map(gp => cMap((gp, v))).sum
        cMap((g, v)) * (2L * tLt + sEq)
      }).sum
      (closed == brute) :| s"closed $closed != brute $brute"
    }

  // eval_detector_auc: the score-DISTINCT cell-grid Mann-Whitney
  // identity (2×-unit auc2 = Σ_v pos(v)·(2·cum_neg(<v) + neg(v)))
  // equals the brute-force pairwise count (2 per win, 1 per tie),
  // and the grid's step-form average precision equals a direct
  // descending-threshold evaluation from the raw list — so the
  // oracle's grid agreement isn't a fixture accident. Exactness
  // pins: perfect separation reads AUC = AP = 1, and pos/neg score
  // distributions that are IDENTICAL multiset-wise read AUC = 0.5
  // exactly.
  property("detector AUC grid ≡ brute-force pairwise; AP ≡ direct eval") =
    Prop.forAll(Gen.choose(2, 60).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 12L), Gen.oneOf(0, 1))))) { sl =>
      val pos = sl.filter(_._2 == 1).map(_._1)
      val neg = sl.filter(_._2 == 0).map(_._1)
      (pos.nonEmpty && neg.nonEmpty) ==> {
        val brute2 = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        val cells = sl.groupBy(_._1).toList.sortBy(_._1).map {
          case (v, xs) => (v, xs.count(_._2 == 1).toLong,
            xs.count(_._2 == 0).toLong)
        }
        val grid2 = cells.zipWithIndex.map { case ((_, p, n), i) =>
          p * (2L * cells.take(i).map(_._3).sum + n)
        }.sum
        val desc = cells.reverse
        val apGrid = desc.zipWithIndex.map { case ((_, p, _), i) =>
          val cp = desc.take(i + 1).map(_._2).sum
          val ct = cp + desc.take(i + 1).map(_._3).sum
          p.toDouble / pos.size * (cp.toDouble / ct)
        }.sum
        val apDirect = sl.map(_._1).distinct.sorted.reverse.map { v =>
          val cp = pos.count(_ >= v)
          pos.count(_ == v).toDouble / pos.size *
            (cp.toDouble / sl.count(_._1 >= v))
        }.sum
        (grid2 == brute2) :| s"grid $grid2 != brute $brute2" &&
          (math.abs(apGrid - apDirect) < 1e-12) :|
            s"AP grid $apGrid != direct $apDirect"
      }
    }

  property("detector AUC exactness: perfect = 1, identical distributions = 0.5") =
    Prop.forAll(Gen.choose(1, 20), Gen.choose(1, 20)) { (np, nn) =>
      def auc2(sl: List[(Long, Int)]): (Long, Long, Long) = {
        val pos = sl.filter(_._2 == 1).map(_._1)
        val neg = sl.filter(_._2 == 0).map(_._1)
        ((for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum,
          pos.size.toLong, neg.size.toLong)
      }
      val perfect = List.fill(np)((9L, 1)) ++ List.fill(nn)((1L, 0))
      val (p2, pp, pn) = auc2(perfect)
      val coin = (1 to np).toList.flatMap(i =>
        List((i.toLong % 4, 1), (i.toLong % 4, 0)))
      val (c2, cp, cn) = auc2(coin)
      (p2 == 2L * pp * pn) :| "perfect detector must read exactly 1" &&
        (2L * c2 == 2L * cp * cn) :| "identical distributions must read 0.5"
    }

  // events_ab_fisher_exact: the ratio-recursion hypergeometric (log
  // weights built from P(k)/P(k−1) steps, normalized by the max)
  // equals the direct factorial pmf, and the two-sided p from the
  // micro-nat decision matches a brute-force enumeration over the
  // support — the closed form the oracle mirrors isn't a fixture
  // accident. Degenerate one-point supports read exactly p = 1.
  property("Fisher exact: ratio recursion ≡ factorial pmf; two-sided p matches brute force") =
    Prop.forAll(Gen.choose(0, 12), Gen.choose(0, 12),
      Gen.choose(0, 12), Gen.choose(0, 12)) { (a, b, c, dd) =>
      val (nT, nC) = (a + b, c + dd)
      val r1 = a + c
      (nT + nC > 0) ==> {
        def lnFact(n: Int): Double =
          (1 to n).map(j => math.log(j.toDouble)).sum
        def lnPmf(k: Int): Double =
          lnFact(nT) - lnFact(k) - lnFact(nT - k) +
            lnFact(nC) - lnFact(r1 - k) - lnFact(nC - r1 + k) -
            (lnFact(nT + nC) - lnFact(r1) - lnFact(nT + nC - r1))
        val kMin = math.max(0, r1 - nC)
        val kMax = math.min(nT, r1)
        val ks = (kMin to kMax).toList
        // the recursion form (what the engines compute)
        val lw = ks.tail.scanLeft(0.0) { (acc, k) =>
          acc + math.log(((nT - k + 1).toDouble * (r1 - k + 1)) /
            (k.toDouble * (nC - r1 + k)))
        }
        // recursion ≡ factorial pmf up to the common normalizer
        val shift = lnPmf(kMin)
        val maxDiff = ks.zip(lw).map { case (k, w) =>
          math.abs(w + shift - lnPmf(k)) }.max
        val pObs = lnPmf(a)
        val pBrute = ks.filter(k => lnPmf(k) <= pObs + 1e-9)
          .map(k => math.exp(lnPmf(k))).sum
        val mx = lw.max
        val den = lw.map(w => math.exp(w - mx)).sum
        val num = ks.zip(lw)
          .filter { case (_, w) => w <= lw(a - kMin) + 1e-9 }
          .map { case (_, w) => math.exp(w - mx) }.sum
        (maxDiff < 1e-9) :| s"recursion drift $maxDiff" &&
          (math.abs(num / den - pBrute) < 1e-9) :|
            s"p ${num / den} != brute $pBrute" &&
          (num / den <= 1.0 + 1e-12) :| "p must be a probability"
      }
    }

  // agg_huber_mean: the 3-round clipped-mean recursion (lower-median
  // start, MAD-scaled clip width, IEEE re-quantization each round)
  // is INSENSITIVE to a single gross outlier — its shift is bounded
  // by the median/MAD order-stat movement plus 3h/n, while the plain
  // mean absorbs the outlier's full mass / n. The margins below are
  // generous versions of those bounds for values ≤ 1e4 and an 1e9
  // outlier.
  property("Huber clipped-mean recursion: one gross outlier barely moves it") =
    Prop.forAll(Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10000L, 10000L)))) { ys =>
      def lowerMedian(xs: List[Long]): Long =
        xs.sorted.apply((xs.size + 1) / 2 - 1)
      def huber(xs: List[Long]): Long = {
        val m0 = lowerMedian(xs)
        val mad = lowerMedian(xs.map(x => math.abs(x - m0)))
        val h = math.floor(1.345 * (1.4826 * mad.toDouble) + 0.5).toLong
        (1 to 3).foldLeft(m0) { (m, _) =>
          val cl = xs.map(x => math.max(m - h, math.min(m + h, x)))
          math.floor(cl.sum.toDouble / xs.size + 0.5).toLong
        }
      }
      def mean(xs: List[Long]): Double = xs.sum.toDouble / xs.size
      val out = ys :+ 1000000000L
      val dHuber = math.abs(huber(out) - huber(ys))
      val dMean = math.abs(mean(out) - mean(ys))
      (dHuber <= 200000L) :| s"huber shift $dHuber must stay bounded" &&
        (dMean >= 1000000.0) :| s"mean shift $dMean absorbs the outlier" &&
        (dHuber.toDouble < dMean / 10.0) :|
          s"huber $dHuber must be far more robust than mean $dMean"
    }

  // events_ab_bayes: the Beta closed-form sum (ratio-recursion log
  // weights seeded by the h(0) product) satisfies the swap symmetry
  // P(t>c) + P(c>t) = 1 (continuous posteriors never tie) and the
  // uniform-treatment base case P = β_c/(α_c+β_c) = E[1 − p_c] —
  // so the engine formula is the right hypergeometric-free identity,
  // not a fixture accident.
  property("Bayesian A/B closed form: swap symmetry and uniform base case") =
    Prop.forAll(Gen.choose(0, 30), Gen.choose(0, 30),
      Gen.choose(0, 30), Gen.choose(0, 30)) { (xc, fc, xt, ft) =>
      def pBeats(ac: Int, bc: Int, at: Int, bt: Int): Double = {
        val lnh0 = (0 until bt)
          .map(j => math.log((bc + j).toDouble / (ac + bc + j))).sum
        val steps = (1 until at).map(i =>
          math.log(((ac + i - 1).toDouble * (bt + i - 1))
            / ((ac + bc + bt + i - 1).toDouble * i)))
        steps.scanLeft(lnh0)(_ + _).map(math.exp).sum
      }
      val (ac, bc, at, bt) = (xc + 1, fc + 1, xt + 1, ft + 1)
      val p1 = pBeats(ac, bc, at, bt)
      val p2 = pBeats(at, bt, ac, bc)
      (math.abs(p1 + p2 - 1.0) < 1e-9) :| s"swap symmetry: $p1 + $p2" &&
        (p1 >= 0.0 && p1 <= 1.0 + 1e-12) :| s"range: $p1" &&
        (math.abs(pBeats(ac, bc, 1, 1) - bc.toDouble / (ac + bc)) < 1e-12) :|
          "uniform-treatment base case E[1 - p_c]"
    }

  // agg_cochran_q: the all-integer identity
  // (k−1)(kΣG² − T²) / (kT − ΣL²) equals the textbook
  // k(k−1)Σ_j(G_j − T/k)² / (kT − ΣL²) — expand the square and
  // ΣG = T collapses the cross term.
  property("Cochran Q integer identity equals the textbook form") =
    Prop.forAll(Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(3, Gen.choose(0L, 1L))))) { rows =>
      val k = 3
      val g = (0 until k).map(j => rows.map(_(j)).sum)
      val t = g.sum
      val l2 = rows.map(r => r.sum * r.sum).sum
      val den = k * t - l2
      (den > 0) ==> {
        val intQ = ((k - 1) * (k * g.map(x => x * x).sum - t * t)).toDouble /
          den.toDouble
        val textQ = k * (k - 1) *
          g.map(x => math.pow(x.toDouble - t.toDouble / k, 2)).sum /
          den.toDouble
        (math.abs(intQ - textQ) < 1e-6 * math.max(1.0, math.abs(textQ))) :|
          s"integer $intQ != textbook $textQ"
      }
    }
}
