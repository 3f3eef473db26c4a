package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator properties for the training-pipeline operators
  * added in round 7: permutation/balance laws of the global shuffle,
  * exactness/maximality of the domain mixer, set semantics of incremental
  * dedup, and BPE encode bounds. Fixed seeds — runs are deterministic.
  */
class LlmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val out = (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    // Gen.apply returns None on a failed suchThat — silently dropping all
    // trials would make every property pass vacuously over zero cases
    assert(out.size >= (n + 1) / 2,
      s"generator produced only ${out.size}/$n cases — property would be near-vacuous")
    out
  }

  test("globalShuffle: permutation, ±1 shard balance, hash order — any corpus size") {
    val sizes = samples(Gen.chooseNum(1, 120), 6)
    sizes.foreach { n =>
      val out = LlmOps.globalShuffle((0L until n.toLong).toDF("doc_id")).collect()
      assert(out.map(_.getAs[Long]("idx")).sorted.toSeq === (0L until n.toLong),
        s"n=$n: idx must be a permutation")
      val sizesByShard = out.groupBy(_.getAs[Long]("shard")).map(_._2.length)
      if (sizesByShard.nonEmpty)
        assert(sizesByShard.max - sizesByShard.min <= 1, s"n=$n: shards unbalanced")
      val byIdx = out.sortBy(_.getAs[Long]("idx"))
        .map(r => (r.getAs[Long]("pri"), r.getAs[Long]("doc_id"))).toSeq
      assert(byIdx === byIdx.sorted, s"n=$n: idx order must follow (pri, doc_id)")
    }
  }

  test("MinKAgg: any reduce/merge split order equals sorted.take(k) exactly") {
    // the aggregator's distributed contract: rows arrive in arbitrary
    // partition splits, partial buffers merge in arbitrary tree order —
    // the result must equal the global bottom-k by (pri, id) regardless.
    // Priorities drawn beyond 2^53 to cover the Long-exactness rationale.
    val rowGen = Gen.zip(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.chooseNum(0L, 1000L))
    val caseGen = Gen.zip(Gen.chooseNum(1, 12), Gen.listOfN(60, rowGen),
      Gen.chooseNum(2, 6))
    samples(caseGen, 8).foreach { case (k, rows, nSplits) =>
      val agg = graft.functions.MinKAgg(k)
      val splits = rows.grouped(math.max(1, rows.size / nSplits)).toSeq
      // aggregator input tuples are (pri, id), the order the samplers bind
      val partials = splits.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(partials.reduce(agg.merge))
      val want = rows.map { case (pri, id) => (pri, id) }.sorted.take(k)
      assert(merged === want, s"k=$k splits=$nSplits")
    }
  }

  test("domainMix: exact w_s·t proportions, quota feasible, t maximal") {
    val gen = Gen.listOfN(4, Gen.chooseNum(1, 30))
    samples(gen, 5).zipWithIndex.foreach { case (counts, trial) =>
      val rows = counts.zipWithIndex.flatMap { case (c, s) =>
        (0 until c).map(i => (trial * 10000L + s * 100L + i, s"src$s"))
      }
      val out = LlmOps.domainMix(rows.toDF("doc_id", "source")).collect()
      val w = (s: Int) => (s % 3 + 1).toLong
      val t = counts.zipWithIndex.map { case (c, s) => c / w(s) }.min
      val got = out.groupBy(_.getAs[String]("source"))
        .map { case (src, rs) => src.drop(3).toInt -> rs.length.toLong }
      counts.indices.foreach { s =>
        assert(got.getOrElse(s, 0L) === w(s) * t,
          s"counts=$counts: src$s quota must be w·t")
        assert(got.getOrElse(s, 0L) <= counts(s), "quota exceeds availability")
      }
      // maximality of the OPERATOR's scale: recover t from the output
      // quotas and check t+1 would be infeasible for some domain — this
      // inspects what domainMix produced, not the test's own arithmetic
      val tOut = counts.indices.map(s => got.getOrElse(s, 0L) / w(s)).distinct
      assert(tOut === Seq(t), s"counts=$counts: all quotas must share one t")
      assert(counts.zipWithIndex.exists { case (c, s) => w(s) * (tOut.head + 1) > c },
        s"counts=$counts: operator t=${tOut.head} is not maximal")
    }
  }

  test("incrementalDedup: output is exactly batch-minus-base by content, any overlap") {
    val word = Gen.listOfN(3, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    samples(Gen.listOfN(12, word), 4).zipWithIndex.foreach { case (texts, trial) =>
      val (baseTexts, batchTexts) = texts.splitAt(6)
      val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val got = LlmOps.incrementalDedup(base, batch).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val want = batchTexts.zipWithIndex
        .collect { case (t, i) if !baseTexts.contains(t) => 100L + i }.toSet
      assert(got === want, s"trial $trial: texts=$texts")
    }
  }

  test("corpusDiff: statuses partition the id space; self-diff is empty — any snapshots") {
    // generated pairs of snapshots over a small id/text alphabet so every
    // status arises: added (id only in new), removed (only in old),
    // changed (both, text differs), unchanged (dropped by default)
    val entry = Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf("aa", "bb", "cc"))
    val snapGen = Gen.listOfN(7, entry).map(_.toMap) // map ⇒ unique ids
    samples(Gen.zip(snapGen, snapGen), 6).zipWithIndex.foreach {
      case ((o, n), trial) =>
        val old = o.toSeq.toDF("doc_id", "text")
        val neu = n.toSeq.toDF("doc_id", "text")
        val got = LlmOps.corpusDiff(old, neu, keepUnchanged = true).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got.keySet === (o.keySet ++ n.keySet), s"trial $trial: id coverage")
        got.foreach { case (id, st) =>
          val want =
            if (!o.contains(id)) "added"
            else if (!n.contains(id)) "removed"
            else if (o(id) == n(id)) "unchanged"
            else "changed"
          assert(st === want, s"trial $trial id=$id")
        }
        // default output = the churn only
        val churn = LlmOps.corpusDiff(old, neu).collect()
          .map(_.getString(1)).toSet
        assert(!churn.contains("unchanged"), s"trial $trial")
        // a snapshot diffed against itself reports nothing
        assert(LlmOps.corpusDiff(old, old).count() === 0L, s"trial $trial")
    }
  }

  test("curateDelta: stages are a monotone funnel; delta = churn; identical snapshots curate nothing") {
    // generated snapshot pairs over a small id space with quality-passing
    // texts (distinct suffixed tokens — no rep3/short-token rejections by
    // construction, so the funnel arithmetic is the thing under test)
    val word = Gen.oneOf("alpha", "bravo", "charli", "deltaa", "echoes")
    val text = Gen.chooseNum(12, 25).flatMap(n => Gen.listOfN(n, word)
      .map(_.zipWithIndex.map { case (w, i) => s"$w$i" }.mkString(" ")))
    val entry = Gen.zip(Gen.chooseNum(0L, 14L), text)
    val snapGen = Gen.listOfN(10, entry).map(_.toMap)
    samples(Gen.zip(snapGen, snapGen), 3).zipWithIndex.foreach {
      case ((o, n), trial) =>
        val old = o.toSeq.toDF("doc_id", "text")
        val neu = n.toSeq.toDF("doc_id", "text")
        val dir = java.nio.file.Files.createTempDirectory("graft-prop-curd").toString
        LlmOps.buildMinHashIndex(old, dir)
        val out = LlmOps.curateDelta(old, neu, dir).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(out.keySet === Set("0_delta", "1_quality", "2_exact", "3_near"),
          s"trial $trial")
        assert(out("0_delta") >= out("1_quality") &&
          out("1_quality") >= out("2_exact") &&
          out("2_exact") >= out("3_near"), s"trial $trial: monotone funnel, got $out")
        // the delta stage counts exactly the churn (added ∪ changed)
        val churn = n.count { case (id, t) => !o.contains(id) || o(id) != t }
        assert(out("0_delta") === churn.toLong, s"trial $trial")
        // a generation curated against itself admits nothing at any stage
        val self = LlmOps.curateDelta(old, old, dir).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(self.values.forall(_ === 0L), s"trial $trial: self-delta, got $self")
    }
  }

  test("stored-index minhash gate ≡ the in-query gate — any generated corpus and batch") {
    // the equivalence the fixed-fixture spec pins, generalized: for
    // generated base/batch pairs (fresh word-soup docs plus DRIFTED
    // copies of base docs, so some batch docs genuinely near-dup and
    // drop), the stored-index probe must agree with the in-query gate
    // doc for doc. Exercises the footprint pruning, the size-gated
    // broadcast, and the verify join against arbitrary band collisions.
    val word = Gen.oneOf("alpha", "bravo", "charli", "deltaa", "echoes", "foxtro")
    val text = Gen.chooseNum(8, 20).flatMap(n => Gen.listOfN(n, word)
      .map(_.zipWithIndex.map { case (w, i) => s"$w$i" }.mkString(" ")))
    val entry = Gen.zip(Gen.chooseNum(0L, 30L), text)
    val pairGen = Gen.zip(Gen.listOfN(8, entry).map(_.toMap),
      Gen.listOfN(5, entry).map(_.toMap))
    samples(pairGen, 3).zipWithIndex.foreach { case ((b, q), trial) =>
      val base = b.toSeq.toDF("doc_id", "text")
      // batch = fresh docs (disjoint ids) ∪ near-copies of half the base
      val drifted = b.toSeq.filter(_._1 % 2 == 0)
        .map { case (id, t) => (id + 2000L, t + " drift tail") }
      val batch = (q.toSeq.map { case (id, t) => (id + 1000L, t) } ++ drifted)
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-mhix").toString
      LlmOps.buildMinHashIndex(base, dir)
      val indexed = LlmOps.incrementalDedupMinHashIndexed(batch, dir)
        .collect().map(_.getLong(0)).toSet
      val inQuery = LlmOps.incrementalDedupMinHash(base, batch)
        .collect().map(_.getLong(0)).toSet
      assert(indexed === inQuery, s"trial $trial: stored-index probe diverged")
      spark.sqlContext.clearCache()
    }
  }

  test("stored-cell cosine gate = the brute-force cell-restricted rule — any vectors") {
    // driver-side truth, written independently of the operator: a batch
    // vector drops iff SOME base vector of its own cell reaches the
    // cosine threshold. Generated small-dim vectors across 3 cells so
    // same-cell hits, cross-cell misses (the IVF trade), and empty-cell
    // probes all arise.
    val vec = Gen.listOfN(3, Gen.chooseNum(-5, 5)).map(_.map(_.toDouble))
      .suchThat(v => v.exists(_ != 0.0))
    val entry = Gen.zip(Gen.chooseNum(0, 2), vec)
    val pairGen = Gen.zip(Gen.listOfN(8, entry), Gen.listOfN(6, entry))
    val threshold = 0.95
    samples(pairGen, 4).zipWithIndex.foreach { case ((b, q), trial) =>
      val base = b.zipWithIndex.map { case ((c, v), i) => (i.toLong, v, c) }
      val batch = q.zipWithIndex.map { case ((c, v), i) => (100L + i, v, c) }
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-cosix").toString
      LlmOps.buildAnnIndex(base.toDF("vec_id", "e", "label"), dir, vecCol = "e")
      val got = LlmOps.incrementalDedupCosineIndexed(
          batch.toDF("vec_id", "e", "label"), dir, vecCol = "e",
          threshold = threshold)
        .collect().map(_.getLong(0)).toSet
      def cos(a: Seq[Double], x: Seq[Double]): Double = {
        val d = a.zip(x).map { case (p, r) => p * r }.sum
        d / (math.sqrt(a.map(p => p * p).sum) * math.sqrt(x.map(p => p * p).sum))
      }
      val want = batch.collect { case (id, v, c)
        if !base.exists { case (_, bv, bc) => bc == c && cos(v, bv) >= threshold } => id
      }.toSet
      assert(got === want, s"trial $trial: batch=$batch base=$base")
      spark.sqlContext.clearCache()
    }
  }

  test("packSequences: offsets are an exact gapless prefix sum — any corpus, any shard size") {
    // the distributed two-level prefix sum must equal the single-node
    // definition: docs laid end to end in doc_id order, no token gap, no
    // overlap — an off-by-one anywhere misplaces every later document in
    // the packed stream
    val caseGen = Gen.zip(Gen.chooseNum(1, 40),
      Gen.chooseNum(1L, 7L), Gen.chooseNum(2, 9))
    samples(caseGen, 5).foreach { case (nDocs, shardSize, budget) =>
      val docs = (0 until nDocs).map { i =>
        (i.toLong * 3, (0 to i % 5).map(j => s"w$j").mkString(" "))
      }
      val out = LlmOps.packSequences(docs.toDF("doc_id", "text"),
          budget = budget, shardSize = shardSize)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val expected = docs.sortBy(_._1).map { case (id, t) =>
        (id, t.split(" ").length.toLong)
      }
      var off = 0L
      out.zip(expected).foreach { case ((id, n, start), (eid, en)) =>
        assert(id === eid && n === en)
        assert(start === off,
          s"doc $id must start exactly where the previous ended (want $off, got $start)")
        off += n
      }
    }
  }

  test("chunkDocs: chunks cover every token exactly once after overlap removal — any window/overlap") {
    // the full-coverage contract the overlap guard protects: dropping the
    // first `overlap` tokens of every chunk after the first and
    // concatenating reconstructs the document token-for-token
    val caseGen = Gen.zip(Gen.chooseNum(1, 120), Gen.chooseNum(2, 24))
      .flatMap { case (n, w) => Gen.chooseNum(0, w - 1).map(o => (n, w, o)) }
    samples(caseGen, 6).foreach { case (nToks, window, overlap) =>
      val toks = (1 to nToks).map(i => s"t$i")
      val out = LlmOps.chunkDocs(Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          window = window, overlap = overlap)
        .collect().map(r => r.getLong(1) -> r.getString(2)).sortBy(_._1)
      val rebuilt = out.zipWithIndex.flatMap { case ((_, chunk), i) =>
        val ts = chunk.split(" ").toSeq
        if (i == 0) ts else ts.drop(overlap)
      }
      assert(rebuilt === toks,
        s"n=$nToks w=$window o=$overlap: chunks must reconstruct the doc exactly")
    }
  }

  test("bpeApply: empty merges = char count; any merges keep 1..chars per word") {
    val word = Gen.listOfN(4, Gen.oneOf("x", "y", "z")).map(_.mkString)
    samples(Gen.listOfN(5, word), 4).foreach { words =>
      val doc = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val raw = LlmOps.bpeApply(doc, Seq.empty).collect()(0).getLong(1)
      assert(raw === words.map(_.length).sum.toLong)
      val merged = LlmOps.bpeApply(doc,
        Seq(("x", "y"), ("y", "z"), ("xy", "z"))).collect()(0).getLong(1)
      assert(merged >= words.length.toLong && merged <= raw)
    }
  }
}
