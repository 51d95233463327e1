package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.HashImpls

/** Property-based layer (the reference has NO property tests — SURVEY.md §5
  * item 6; this exceeds its test strategy): algebraic invariants of the
  * hand-written kernels and aggregators over randomized inputs, where
  * example-based specs can only pin single points.
  */
object KernelProperties extends Properties("graft.kernels") {

  private def arr(ts: Seq[String]) =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  private val tokens: Gen[List[String]] =
    Gen.listOfN(30, Gen.choose(0, 400).map(i => s"tok$i"))

  property("simhash is permutation-invariant over token multisets") =
    forAll(tokens) { ts =>
      val h = HashImpls.simhash64(arr(ts))
      h == HashImpls.simhash64(arr(ts.reverse)) &&
        h == HashImpls.simhash64(arr(ts.sortBy(_.hashCode)))
    }

  property("minhash entries are elementwise mins: signature of a union <= both parts") =
    forAll(tokens, tokens) { (xs, ys) =>
      val k = 32
      val mu = HashImpls.minhash64(arr((xs ++ ys).distinct), k)
      val mx = HashImpls.minhash64(arr(xs.distinct), k)
      val my = HashImpls.minhash64(arr(ys.distinct), k)
      (0 until k).forall { i =>
        mu.getLong(i) == math.min(mx.getLong(i), my.getLong(i))
      }
    }

  property("maxRunCount equals max element multiplicity (nulls ignored, 0 on empty)") =
    forAll(Gen.listOf(Gen.choose(0, 12).map(i => s"w$i")), Gen.choose(0, 3)) {
      (ts, nNulls) =>
        val want =
          if (ts.isEmpty) 0L
          else ts.groupBy(identity).values.map(_.length).max.toLong
        // extra nulls must not contribute runs or displace the max
        val mixed: Array[Any] =
          (ts.map(UTF8String.fromString(_): Any) ++ Seq.fill(nNulls)(null: Any))
            .toArray
        HashImpls.maxRunCount(new GenericArrayData(mixed)) == want &&
          HashImpls.maxRunCount(arr(ts)) == want
    }

  property("rolling hash is prefix-compositional: h(a+b) derivable from h(a)") =
    forAll(Gen.alphaNumStr.map(_.take(40)), Gen.alphaNumStr.map(_.take(40))) {
      (a, b) =>
        val hab = HashImpls.rollingHash(UTF8String.fromString(a + b))
        var h = HashImpls.rollingHash(UTF8String.fromString(a))
        b.getBytes("UTF-8").foreach(x => h = h * 1000003L + (x & 0xffL))
        hab == h
    }

  property("cosine is symmetric, bounded, and 1 on self") =
    forAll(Gen.listOfN(16, Gen.choose(-100.0, 100.0)),
           Gen.listOfN(16, Gen.choose(-100.0, 100.0))) { (a, b) =>
      val nonZero = a.exists(_ != 0.0) && b.exists(_ != 0.0)
      !nonZero || {
        val ga = new GenericArrayData(a.toArray[Any])
        val gb = new GenericArrayData(b.toArray[Any])
        val ab = HashImpls.cosine(ga, gb)
        val ba = HashImpls.cosine(gb, ga)
        val self = HashImpls.cosine(ga, ga)
        ab == ba && ab >= -1.0000001 && ab <= 1.0000001 &&
          math.abs(self - 1.0) < 1e-12
      }
    }

  property("TopKDoubles: any split/merge order equals a full sort's top k") =
    forAll(Gen.listOf(Gen.choose(-1e9, 1e9)), Gen.choose(1, 8),
           Gen.choose(0, 100)) { (xs, k, splitSeed) =>
      val agg = new graft.functions.TopKDoubles(k)
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).toSeq
      val cut = if (xs.isEmpty) 0 else splitSeed % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))).toSeq
      val want = xs.sorted(Ordering[Double].reverse).take(k)
      whole == want && merged == want
    }

  property("TopKDoubles ignores NaN (SQL ordering parity)") =
    forAll(Gen.listOf(Gen.choose(-1e9, 1e9)), Gen.choose(1, 8),
           Gen.choose(0, 10)) { (xs, k, nans) =>
      val agg = new graft.functions.TopKDoubles(k)
      // NaNs interleaved anywhere must not displace real values — an
      // unguarded insert lets one NaN permanently occupy top-1
      val withNaN = (if (nans > 5) Seq(Double.NaN) else Seq.empty) ++
        xs.flatMap(x => x +: Seq.fill(nans % 3)(Double.NaN))
      val got = agg.finish(withNaN.foldLeft(agg.zero)(agg.reduce)).toSeq
      val want = xs.sorted(Ordering[Double].reverse).take(k)
      got == want
    }

  property("hyperplane sign-bit collision rate matches 1 - theta/pi (Charikar)") = {
    // rotate a base vector by a known angle inside a seeded 2-D subspace:
    // the sign-bit collision probability over Gaussian hyperplanes is
    // exactly 1 - theta/pi; with 192 bits x 50 seeds per angle the
    // empirical rate must land within ~3 standard errors
    val dim = 64
    val bands = 16
    val rows = 12 // 192 bits total
    def unit(seed: Int): Array[Double] = {
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def bits(v: Array[Double], seed: Long): Seq[Boolean] = {
      val bs = HashImpls.hyperplaneBands(
        new GenericArrayData(v.toArray[Any]), bands, rows, seed)
      (0 until bands).flatMap { b =>
        val w = bs.getLong(b)
        (0 until rows).map(r => ((w >> r) & 1L) == 1L)
      }
    }
    Prop.all(Seq(0.2, 0.45, 0.9, 1.5).map { theta =>
      val trials = for (s <- 1 to 50) yield {
        val a = unit(s)
        val o0 = unit(s + 1000)
        // Gram-Schmidt an orthonormal partner, rotate a by theta toward it
        val proj = a.zip(o0).map { case (x, y) => x * y }.sum
        val o1 = o0.zip(a).map { case (y, x) => y - proj * x }
        val n1 = math.sqrt(o1.map(x => x * x).sum)
        val b = a.zip(o1).map { case (x, y) =>
          math.cos(theta) * x + math.sin(theta) * (y / n1) }
        val (ba, bb) = (bits(a, 7L * s), bits(b, 7L * s))
        ba.zip(bb).count { case (x, y) => x == y }
      }
      val rate = trials.sum.toDouble / (trials.size * bands * rows)
      val expect = 1.0 - theta / math.Pi
      val se = math.sqrt(expect * (1 - expect) / (trials.size * bands * rows))
      Prop(math.abs(rate - expect) < 4 * se + 0.005) :|
        f"theta=$theta%.2f rate=$rate%.4f expect=$expect%.4f"
    }: _*)
  }

  property("Widening uint semantics match BigInt bit reinterpretation") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { x =>
      val asUnsigned = BigInt(x) & ((BigInt(1) << 64) - 1)
      // the column expression is exercised in WideningSpec; here we pin the
      // reference semantics the expression implements
      java.lang.Long.toUnsignedString(x) == asUnsigned.toString
    }
}
