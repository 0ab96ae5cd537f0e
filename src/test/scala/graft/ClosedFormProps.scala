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
}
