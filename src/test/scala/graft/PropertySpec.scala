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

  property("cdcCuts equals the naive md5-window cut rule (code-point windows)") = {
    // the JVM restatement of the declarative form cdcCuts replaced
    // (r18): md5 over the UTF-8 bytes of each w-code-point window, cut
    // at p+w-1 when the hex digest leads with '0' (== zero top nibble)
    def naive(str: String, w: Int): Seq[Int] = {
      val cps = str.codePoints().toArray
      val m = cps.length
      (1 to m - w + 1).filter { p =>
        val win = new String(cps, p - 1, w)
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(win.getBytes("UTF-8"))
        (d(0) & 0xf0) == 0
      }.map(_ + w - 1)
    }
    val charGen = Gen.frequency(
      12 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      2 -> Gen.oneOf('é', 'ß', '中', 'λ')) // multi-byte: slice != bytes
    forAll(Gen.listOf(charGen).map(_.mkString), Gen.choose(2, 12)) {
      (s, w) =>
        val got = {
          val a = HashImpls.cdcCuts(UTF8String.fromString(s), w)
          (0 until a.numElements()).map(a.getInt)
        }
        got == naive(s, w)
    }
  }

  property("greedyTokenCount equals a naive scan-the-whole-vocab reference") = {
    val fixtureWords = Gen.oneOf("table", "value", "customer", "sort",
      "the", "query", "window", "stream", "zzz", "qux", "a", "xylophone")
    forAll(Gen.listOfN(12, fixtureWords), Gen.alphaNumStr.map(_.take(30))) {
      (ws, extra) =>
        def naive(str: String): Long = {
          var i = 0
          var n = 0L
          while (i < str.length) {
            val ms = HashImpls.TokenVocab.filter(w => str.startsWith(w, i))
            i += (if (ms.isEmpty) 1 else ms.map(_.length).max)
            n += 1
          }
          n
        }
        val s = (ws :+ extra).mkString(" ")
        HashImpls.greedyTokenCount(UTF8String.fromString(s)) == naive(s) &&
          HashImpls.greedyTokenCount(UTF8String.fromString("")) == 0L &&
          // byte fallback counts CODEPOINTS (oracle parity: DuckDB len()
          // is character-based) — one astral char is ONE token, and mixed
          // input advances past it without splitting the surrogate pair
          HashImpls.greedyTokenCount(UTF8String.fromString("😀")) == 1L &&
          HashImpls.greedyTokenCount(
            UTF8String.fromString("😀table")) == 2L
    }
  }

  property("bpeTokenCount equals a naive list-based merge-loop reference") = {
    val ranks: Map[(String, String), Int] =
      HashImpls.BpeMerges.zipWithIndex.map { case ((a, b), r) => (a, b) -> r }
        .toMap
    // direct transliteration of the spec: repeat { merge the LEFTMOST
    // occurrence of the LOWEST-RANK adjacent pair } until none applies
    def naiveWord(w: String): Int = {
      var toks = w.map(_.toString).toList
      var go = toks.size > 1
      while (go) {
        val cands = toks.zip(toks.tail).zipWithIndex
          .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.minBy(identity)
          toks = toks.take(i) ::: (toks(i) + toks(i + 1)) :: toks.drop(i + 2)
          go = toks.size > 1
        }
      }
      toks.size
    }
    val wordGen = Gen.oneOf(
      // random strings over the merge-table alphabet (dense pair hits)
      Gen.choose(1, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("tablevuwindosrcjhfp".toList))
          .map(_.mkString)),
      Gen.oneOf("table", "value", "window", "batch", "star", "hash",
        "data", "join", "the", "scan", "slow", "fast", "part", "sort"))
    forAll(Gen.listOfN(10, wordGen)) { ws =>
      val s = ws.mkString(" ")
      HashImpls.bpeTokenCount(UTF8String.fromString(s)) ==
        ws.map(naiveWord).sum.toLong
    }
  }

  property("bpe golden merges: chains resolve, rank order wins") = {
    def is(s: String, n: Long) =
      Prop(HashImpls.bpeTokenCount(UTF8String.fromString(s)) == n) :| s
    Prop.all(
      // full merge chains collapse dictionary words to one token
      (Seq("table", "value", "window", "batch", "the", "hash", "data",
        "join").map(is(_, 1L)) ++ Seq(
        // rank order is load-bearing: in "star", (t,a)@3 outranks
        // (s,t)@11 → s·ta·r, NOT st·ar
        is("star", 3L), is("sort", 3L),
        // no-merge fallback stays per-codepoint; words sum independently
        is("xyz", 3L), is("the table", 2L), is("", 0L))): _*)
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

  property("GramTriangleAgg: any split/merge equals the naive pair sums") =
    forAll(Gen.choose(2, 6), Gen.choose(0, 100)) { (d, splitSeed) =>
      forAll(Gen.listOfN(8,
        Gen.listOfN(d, Gen.choose(-1000L, 1000L)))) { vecs =>
        val agg = new graft.functions.GramTriangleAgg(d)
        def run(vs: Seq[Seq[Long]]): Seq[Long] =
          agg.finish(vs.foldLeft(agg.zero) { (b, v) =>
            agg.reduce(b, v)
          })
        val whole = run(vecs)
        val cut = splitSeed % (vecs.length + 1)
        val (l, r) = vecs.splitAt(cut)
        val merged = agg.finish(agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))).toSeq
        val want = for { i <- 0 until d; j <- i until d }
          yield vecs.map(v => v(i) * v(j)).sum
        whole == want && merged == want
      }
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

/** Wire-format serde bijection over randomized plan trees — the
  * property-based generalization of the reference's ~25 hand-written
  * `roundtrip_test!` cases (rust/core/src/serde/logical_plan/mod.rs):
  * instead of 25 points, every generated tree (arbitrary-unicode
  * literals and names included, to stress JSON escaping) must satisfy
  * `fromJson(toJson(p)) == p` with `toJson` a fixpoint. Pure driver-side
  * serde — no Spark session involved.
  */
object PlanSerdeProperties extends Properties("graft.planserde") {
  import graft.plans.PlanSerde._

  private val anyStr: Gen[String] =
    for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf('"', '\\', '\n', '\t', 'é', '中', ' ', ':')))
      emoji <- Gen.oneOf("", "🦆") // valid surrogate pair only
    } yield cs.mkString + emoji

  private val genLit: Gen[WExpr] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(v => WLit("long", v.toString)),
    Gen.choose(-1e6, 1e6).map(v => WLit("double", v.toString)),
    anyStr.map(s => WLit("string", s)),
    Gen.oneOf(true, false).map(b => WLit("bool", b.toString)),
    Gen.choose(0, 20000).map(d => WLit("date", d.toString)),
    Gen.choose(0L, 2000000000000000L).map(us => WLit("timestamp", us.toString)),
    Gen.oneOf("double", "string", "bigint").map(t => WLit(s"null:$t", "")))

  private val genCol: Gen[WExpr] =
    Gen.oneOf("l_quantity", "o_totalprice", "user_id", "text").map(WCol(_))

  private val binOps = Seq("and", "or", "eq", "neq", "lt", "lteq", "gt",
    "gteq", "plus", "minus", "multiply", "divide", "modulus")

  private def genExpr(depth: Int): Gen[WExpr] =
    if (depth <= 0) Gen.oneOf(genLit, genCol)
    else Gen.frequency(
      3 -> genLit,
      3 -> genCol,
      3 -> (for {
        op <- Gen.oneOf(binOps)
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield WBinary(op, l, r)),
      1 -> genExpr(depth - 1).map(WNot(_)),
      1 -> genExpr(depth - 1).map(WIsNull(_)),
      1 -> genExpr(depth - 1).map(WIsNotNull(_)),
      1 -> (for { e <- genExpr(depth - 1); t <- Gen.oneOf("double", "string",
        "decimal(18,4)") } yield WCast(e, t)),
      1 -> (for { e <- genExpr(depth - 1); n <- anyStr } yield WAlias(e, n)),
      1 -> (for {
        fn <- Gen.oneOf("sum", "min", "max", "avg", "count")
        a <- genExpr(depth - 1); d <- Gen.oneOf(true, false)
      } yield WAggCall(fn, Some(a), d)),
      1 -> Gen.const(WAggCall("count_star", None, distinct = false)),
      1 -> (for {
        fn <- Gen.oneOf("lower", "abs", "round", "coalesce")
        n <- Gen.choose(1, 2); as <- Gen.listOfN(n, genExpr(depth - 1))
      } yield WScalarFn(fn, as)))

  private def genPlan(depth: Int): Gen[WPlan] =
    if (depth <= 0) Gen.oneOf(Gen.const(WScan("lineitem")),
      Gen.const(WScan("events")), Gen.const(WOneRow))
    else Gen.frequency(
      2 -> genPlan(0),
      2 -> (for { in <- genPlan(depth - 1); n <- Gen.choose(1, 5)
        es <- Gen.listOfN(n, genExpr(2)) } yield WProjection(in, es)),
      2 -> (for { in <- genPlan(depth - 1); p <- genExpr(2) }
        yield WSelection(in, p)),
      1 -> (for { in <- genPlan(depth - 1); g <- Gen.listOfN(2, genExpr(1))
        a <- Gen.listOfN(2, genExpr(1)) } yield WAggregate(in, g, a)),
      1 -> (for { l <- genPlan(depth - 1); r <- genPlan(depth - 1)
        jt <- Gen.oneOf("inner", "leftouter", "leftsemi")
        k <- Gen.choose(1, 2); lk <- Gen.listOfN(k, anyStr)
        rk <- Gen.listOfN(k, anyStr) } yield WJoin(l, r, jt, lk, rk)),
      1 -> (for { in <- genPlan(depth - 1); n <- Gen.choose(1, 3)
        ks <- Gen.listOfN(n, for { e <- genExpr(1); a <- Gen.oneOf(true, false)
          nf <- Gen.oneOf(true, false) } yield WSortKey(e, a, nf))
      } yield WSort(in, ks)),
      1 -> (for { in <- genPlan(depth - 1); n <- Gen.choose(0L, 1000000L) }
        yield WLimit(in, n)),
      1 -> (for { in <- genPlan(depth - 1); n <- Gen.choose(1, 64)
        k <- Gen.choose(0, 2); es <- Gen.listOfN(k, genExpr(1)) }
        yield WRepartition(in, n, es)))

  property("fromJson(toJson(p)) == p and toJson is a fixpoint") =
    forAll(genPlan(3)) { p =>
      val j = toJson(p)
      fromJson(j) == p && toJson(fromJson(j)) == j
    }
}
