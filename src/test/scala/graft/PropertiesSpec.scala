package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.RollingHashExpr

/** Property-based checks on the pure kernels of the custom expressions
  * (no Spark jobs — these exercise the same static methods the codegen
  * calls). */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("mix_temperature isqrt: double-seed + one CASE step each way is " +
    "exact for grid values <= 2^52") {
    // the EXACT scalar mirror of mixTemperatureOf's isqrt chain (and of
    // the oracle SQL's s0/s1/CASE steps) — division form, overflow-safe
    // at any BIGINT (s > n div s ⟺ s² > n for positive integers)
    def alg(n: Long): Long = {
      val s0 = math.floor(math.sqrt(n.toDouble)).toLong
      val down = if (s0 > 0 && s0 > n / s0) s0 - 1 else s0
      if ((down + 1) <= n / (down + 1)) down + 1 else down
    }
    // ground truth via BigInt bisection-free Newton
    def isqrt(n: Long): Long = {
      var x = BigInt(n).bigInteger.sqrt().longValueExact()
      while (x * x > n) x -= 1
      while ((x + 1) * (x + 1) <= n) x += 1
      x
    }
    val grid = Gen.oneOf(
      Gen.chooseNum(0L, 1L << 20),                    // small sources
      Gen.chooseNum(0L, 1L << 52),                    // full exact domain
      Gen.chooseNum((1L << 52) - (1L << 20), 1L << 52), // upper boundary
      Gen.chooseNum(0L, 1L << 26).map(s => s * s),    // perfect squares
      Gen.chooseNum(1L, 1L << 26).map(s => s * s - 1)) // just below them
    check(Prop.forAll(grid) { n => alg(n) == isqrt(n) })
  }

  test("Lehmer mix: range, injectivity on [1, M-1], and overflow headroom") {
    import graft.functions.DetMix.{Modulus, Multiplier}
    // the EXACT scalar mirror of DetMix.lehmerMix's column expression
    // (sign-of-dividend %, no normalization — keys here are ids ≥ 0)
    def mix(k: Long): Long =
      (k % Modulus) * Multiplier % Modulus * Multiplier % Modulus
    // range for arbitrary non-negative keys, incl. huge ones where a raw
    // Knuth multiply would overflow a long (the reason the mix exists)
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { k =>
      val h = (k % Modulus) * Multiplier % Modulus * Multiplier % Modulus
      h >= 0L && h < Modulus &&
        // each product stays far inside long range (no ANSI overflow)
        (k % Modulus) <= (Long.MaxValue / Multiplier)
    })
    // g is a unit mod the prime M, so two multiplications are a
    // bijection on residues: distinct keys below M never collide
    check(Prop.forAll(Gen.chooseNum(1L, Modulus - 1), Gen.chooseNum(1L, Modulus - 1)) {
      (a, b) => (a == b) == (mix(a) == mix(b))
    })
    // two steps genuinely wrap small keys (one step would leave k<~44k
    // as a monotone prefix — the sampling bug the second step prevents)
    assert((1L to 100L).map(mix).sliding(2).exists(p => p.head > p.last))
  }

  test("geometry knobs: bounds and monotonicity over arbitrary corpus sizes") {
    import graft.similarity.Similarity.{probeBuckets, nlistForCorpus, nprobeForNlist, mForDim, autoBits}
    val n = Gen.chooseNum(0L, Long.MaxValue / 2)
    // probe-set size target: buckets >= 1 and expected sample n/buckets
    // stays within [cap, 2*cap) once n clears the cap
    check(Prop.forAll(n) { x =>
      val b = probeBuckets(x)
      b >= 1L && (x < 1024 || (x / b >= 1024 && x / b < 2048))
    })
    check(Prop.forAll(n, n) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      probeBuckets(lo) <= probeBuckets(hi) &&          // monotone
      nlistForCorpus(lo) <= nlistForCorpus(hi) &&
      autoBits(lo) <= autoBits(hi)
    })
    // nprobe: floor 2, never exceeds nlist, monotone
    check(Prop.forAll(Gen.chooseNum(1, Int.MaxValue / 2)) { nl =>
      val p = nprobeForNlist(nl)
      p >= 2 && (nl < 8 || p <= nl) && nprobeForNlist(nl + 1) >= p
    })
    // m: the LARGEST divisor of d not exceeding max(1, d/8) (ADVICE
    // r9: the raw d/8 quotient threw whenever it didn't divide d) —
    // always tiles, never exceeds the FAISS-conventional width, and no
    // larger admissible divisor exists
    check(Prop.forAll(Gen.chooseNum(1, 1 << 16)) { d =>
      val m = mForDim(d)
      val t = math.max(1, d / 8)
      m >= 1 && m <= t && d % m == 0 &&
        !((m + 1) to t).exists(d % _ == 0)
    })
    // exact integer sqrt: the unique s with s² ≤ n < (s+1)², checked
    // against BigInt arithmetic (no double anywhere in the check)
    import graft.similarity.Similarity.{isqrt, nlistAnnForCorpus}
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { x =>
      val s = BigInt(isqrt(x))
      s * s <= x && (s + 1) * (s + 1) > x
    })
    // ANN nlist: floor 4, Int.MaxValue clamp, monotone, equals the
    // occupancy formula up to 65 280 and is bounded by the 4·√n branch
    // past that. 65 280, not 65 536 (ADVICE r10): for
    // x ∈ [65 281, 65 535] the min already picks 4·isqrt(x) = 1020,
    // one below ⌈x/64⌉ — the exact condition is
    // 4·isqrt(x) ≥ ⌈x/64⌉, which last holds at x = 65 280
    check(Prop.forAll(n, n) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      nlistAnnForCorpus(lo) <= nlistAnnForCorpus(hi)
    })
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { x =>
      val v = nlistAnnForCorpus(x)
      v >= 4 && v <= Int.MaxValue &&
        (x > 65280L || v == nlistForCorpus(x)) &&
        (x <= 65280L || v.toLong <= 4L * isqrt(x))
    })
    // the band itself, pinned exhaustively so the bound above can't
    // silently rot: sqrt binds from exactly 65 281
    (65281L to 65535L).foreach { x =>
      assert(nlistAnnForCorpus(x) == 1020 && nlistForCorpus(x) > 1020)
    }
    assert(nlistAnnForCorpus(65280L) == nlistForCorpus(65280L))
  }

  test("rolling hash: matches a reference fold for arbitrary strings incl. non-ASCII") {
    def reference(s: String): Long = {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    val mixedStr = Gen.listOf(
      Gen.oneOf(Gen.asciiPrintableChar, Gen.oneOf('а', 'б', 'я', '的', 'é', ' ')))
      .map(_.mkString)
    check(Prop.forAll(mixedStr) { s =>
      RollingHashExpr.compute(UTF8String.fromString(s)) == reference(s)
    })
  }

  test("rolling hash: range [0, mod) and determinism") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = RollingHashExpr.compute(UTF8String.fromString(s))
      h >= 0L && h < RollingHashExpr.Mod &&
        h == RollingHashExpr.compute(UTF8String.fromString(s))
    })
  }

  test("json_int kernel: matches the oracle regex on arbitrary JSON-ish strings") {
    import graft.functions.JsonIntExpr
    val rx = """"k": *(-?[0-9]+)""".r
    def reference(s: String): Option[Int] =
      rx.findFirstMatchIn(s).flatMap { m =>
        val digits = m.group(1)
        try Some(digits.toInt) catch { case _: NumberFormatException => None }
      }
    // fragments that stress the scanner: key-ish tokens, partial
    // matches, spaces, signs, digit runs, quotes, non-ASCII
    val frag = Gen.oneOf("\"k\":", "\"k\"", "k:", "\"kk\":", " ", "  ", "-",
      "12", "7", "0", "{", "}", ",", "\"", "x", "é", "\"k\": ", ":", "99999999999")
    val jsonish = Gen.listOf(frag).map(_.mkString)
    check(Prop.forAll(jsonish) { s =>
      val got = Option(JsonIntExpr.extract(
        UTF8String.fromString(s), UTF8String.fromString("k"))).map(_.intValue)
      got == reference(s)
    })
  }

  test("simhash buffer algebra: merge == sequential update; serde round-trips") {
    import graft.functions.SimHashAgg
    val agg = SimHashAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    def updateAll(hs: Seq[Long]): Array[Long] = {
      val buf = agg.createAggregationBuffer()
      hs.foreach { h =>
        var b = 0
        while (b < 64) { buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
      buf
    }
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val merged = agg.merge(updateAll(xs), updateAll(ys))
      val sequential = updateAll(xs ++ ys)
      merged.toSeq == sequential.toSeq &&
        agg.deserialize(agg.serialize(sequential)).toSeq == sequential.toSeq
    })
  }

  test("minhash property: signature agreement approximates Jaccard of shingle sets") {
    // pure-JVM mirror of the Spark minhash (same constants not required —
    // the estimator property is what's under test)
    val r = new scala.util.Random(7)
    val as = Array.fill(128)((r.nextInt(1 << 29).toLong << 1) | 1L)
    val r2 = new scala.util.Random(11)
    val bs = Array.fill(128)(r2.nextInt(Int.MaxValue).toLong)
    val p = 2147483647L
    def sig(set: Set[Long]): Array[Long] =
      Array.tabulate(128)(i => set.map(h => (h * as(i) + bs(i)) % p).min)
    def jaccard(x: Set[Long], y: Set[Long]): Double =
      if (x.isEmpty && y.isEmpty) 1.0
      else (x & y).size.toDouble / (x | y).size
    // domain restricted to [0, p): values differing by exactly p are
    // indistinguishable under every affine perm mod p (h ≡ h+p), which
    // would break the estimator on adversarial inputs; real inputs are
    // 32-bit hashes where such pairs occur with probability ~2^-31 and
    // the exact-Jaccard verify step absorbs them
    val genSet = Gen.nonEmptyListOf(Gen.chooseNum(0L, 2147483646L)).map(_.toSet)
    check(Prop.forAll(genSet, genSet) { (x, y) =>
      val est = sig(x).zip(sig(y)).count { case (a, b) => a == b } / 128.0
      math.abs(est - jaccard(x, y)) < 0.35 // 128 perms ⇒ σ ≈ 0.044; 8σ bound
    })
  }

  test("quantile sketch property: rank error bounded for arbitrary inputs and splits") {
    import graft.functions.QuantileSketch
    // arbitrary values (duplicates and adversarial orders included),
    // arbitrary split into sub-sketches merged back — the deterministic
    // MRL bound must hold regardless
    val genVals = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    val genChunks = Gen.chooseNum(1, 7)
    check(Prop.forAll(genVals, genChunks) { (vals, chunks) =>
      val k = 32
      val parts = vals.grouped(math.max(1, vals.length / chunks)).toSeq
      val sketches = parts.map { p =>
        val s = new QuantileSketch(k)
        p.foreach { v => s.add(v); s.n += 1 }
        s
      }
      val merged = sketches.reduce { (a, b) => a.mergeIn(b); a }
      val sorted = vals.sorted.toArray
      val n = sorted.length
      // generous bound: exact below k; above, levels ≈ log2(n/k),
      // theoretical ε ≈ levels/(2k) — allow 4× slack
      val eps = if (n <= k) 1e-9
        else 4.0 * (math.log(n.toDouble / k) / math.log(2) + 1) / (2 * k)
      Seq(0.0, 0.25, 0.5, 0.75, 1.0).forall { phi =>
        val est = merged.query(phi)
        // a duplicated value occupies a rank INTERVAL [lo, hi]; error is
        // the distance from the target rank to that interval
        val lo = sorted.indexWhere(_ >= est) match {
          case -1 => n - 1
          case i  => i
        }
        val hi = sorted.lastIndexWhere(_ <= est) match {
          case -1 => 0
          case i  => i
        }
        val target = phi * (n - 1)
        val err = math.max(0.0, math.max(lo - target, target - hi))
        err <= eps * n + 1
      }
    })
  }

  test("range_bucket: the binary search IS lower_bound — equals the " +
    "strict-< linear count for any key and sorted distinct boundaries") {
    import graft.functions.RangeBucketExpr.bucket
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-1e9, 1e9)).map(_.distinct.sorted.toArray)
      // keys EQUAL to a boundary are the tie case the operators rely on:
      // draw half the keys from the SAME array under test
      k <- if (a.isEmpty) Gen.chooseNum(-2e9, 2e9)
           else Gen.oneOf(Gen.chooseNum(-2e9, 2e9), Gen.oneOf(a.toSeq))
    } yield (a, k)
    check(Prop.forAll(gen) { case (a, k) =>
      bucket(k, a) == a.count(_ < k)
    })
  }
}
