package graft

import graft.engine.{Ops, TableOps}
import graft.functions.TopKBuffer
import org.apache.spark.sql.functions._

import scala.util.Random

/** Deterministic randomized properties (fixed seeds) for the native
  * kernels and operators: bounded top-k vs naive sort, merge
  * associativity, last-writer-wins upsert, salted-join equivalence,
  * minhash similarity estimation.
  */
class PropertySpec extends SparkSpec {

  test("TopKBuffer matches naive sort-take for random streams and splits") {
    val rnd = new Random(7)
    (1 to 50).foreach { _ =>
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(200)
      val items = Seq.fill(n)((math.floor(rnd.nextDouble() * 20) / 20.0,
        rnd.nextInt(40).toLong))
      // naive top-k over the multiset (duplicates allowed)
      val expect = items.sortBy { case (s, id) => (-s, id) }.take(k)
      val buf = new TopKBuffer(k)
      items.foreach { case (s, id) => buf.add(s, id) }
      assert(buf.sortedPairs.toSeq === expect, s"k=$k n=$n")
      // split-merge invariance: any partition of the stream merges to the
      // same top-k (the partial-aggregation correctness property)
      if (n > 1) {
        val cut = 1 + rnd.nextInt(n - 1)
        val (l, r) = items.splitAt(cut)
        val b1 = new TopKBuffer(k); l.foreach { case (s, id) => b1.add(s, id) }
        val b2 = new TopKBuffer(k); r.foreach { case (s, id) => b2.add(s, id) }
        b1.merge(b2)
        assert(b1.sortedPairs.toSeq === expect, s"merge k=$k cut=$cut")
      }
    }
  }

  test("dedup TopKBuffer has set semantics under duplication and splits") {
    val rnd = new Random(11)
    (1 to 50).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      // coarse score grid + small id range force many exact duplicates,
      // then each item is fed 1-3 times (the spilled-probe arrival shape)
      val base = Seq.fill(rnd.nextInt(60))(
        (math.floor(rnd.nextDouble() * 8) / 8.0, rnd.nextInt(12).toLong))
      val stream = rnd.shuffle(base.flatMap(x => Seq.fill(1 + rnd.nextInt(3))(x)))
      val expect = base.distinct.sortBy { case (s, id) => (-s, id) }.take(k)
      val buf = new TopKBuffer(k, dedup = true)
      stream.foreach { case (s, id) => buf.add(s, id) }
      assert(buf.sortedPairs.toSeq === expect, s"k=$k")
      if (stream.size > 1) {
        val cut = 1 + rnd.nextInt(stream.size - 1)
        val (l, r) = stream.splitAt(cut)
        val b1 = new TopKBuffer(k, dedup = true)
        l.foreach { case (s, id) => b1.add(s, id) }
        val b2 = new TopKBuffer(k, dedup = true)
        r.foreach { case (s, id) => b2.add(s, id) }
        b1.merge(b2)
        assert(b1.sortedPairs.toSeq === expect, s"merge k=$k cut=$cut")
      }
    }
  }

  test("sortedIntersectCount equals set-intersection size on random sets") {
    import spark.implicits._
    val rnd = new Random(13)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toString).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toString).distinct.sorted
      (a, b, (a.toSet & b.toSet).size)
    }
    val got = rows.toDF("a", "b", "expect")
      .select(graft.functions.text.sortedIntersectCount(col("a"), col("b"))
        .as("got"), col("expect"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("termCounts agrees with explode+groupBy on random token streams") {
    import spark.implicits._
    val rnd = new Random(17)
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(60))("w" + rnd.nextInt(15))))
      .filter(_._2.nonEmpty)
    val df = docs.toDF("doc_id", "toks")
    val viaKernel = df.select(col("doc_id"),
        explode(graft.functions.text.termCounts(col("toks"))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    val viaAgg = df.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    assert(viaKernel === viaAgg)
  }

  // the flagship-entry smoke check lives in TutorialGoldenSpec
  // ("SparkEntry.entry returns rows on sf0.001") — not duplicated here:
  // it is one of the slowest full-pipeline executions in the suite

  test("parser survives whitespace/case mutations; garbage fails cleanly") {
    import graft.ksql.KsqlParser
    val rnd = new Random(23)
    val valid = Seq(
      "SET 'auto.offset.reset' = 'earliest'",
      "CREATE STREAM s (id VARCHAR KEY, v DOUBLE) WITH (KAFKA_TOPIC='s')",
      "CREATE TABLE t WITH (KAFKA_TOPIC='t') AS SELECT id FROM s",
      "INSERT INTO s VALUES ('a', 1.5)",
      "SELECT id FROM s EMIT CHANGES",
      "SHOW TOPICS", "DESCRIBE s", "EXPLAIN SELECT id FROM s",
      "DROP STREAM IF EXISTS s", "PRINT 's' FROM BEGINNING", "TERMINATE q")
    valid.foreach { stmt =>
      // random case flips on keywords + whitespace padding must not
      // change what parses
      val mutated = stmt.map(c =>
        if (c.isLetter && rnd.nextBoolean()) c.toUpper else c)
        .replace(" ", if (rnd.nextBoolean()) "  " else " ")
      KsqlParser.parse(mutated) // must not throw
    }
    Seq("SELEC id FROM s", "CREATE NOISE x", "12345", "INSERT s 1")
      .foreach { garbage =>
        intercept[IllegalArgumentException] { KsqlParser.parse(garbage) }
      }
  }

  test("latestByKey is last-writer-wins for random upsert sequences") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = Seq.fill(300)((rnd.nextInt(20).toString,
      rnd.nextInt(1000), rnd.nextDouble()))
      .zipWithIndex.map { case ((k, v, d), i) => (k, v, d, i.toLong) }
    val df = rows.toDF("k", "v", "d", "_offset").repartition(7)
    val got = TableOps.latestByKey(df, Seq("k"), "_offset")
      .select("k", "v").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val expect = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.maxBy(_._4)._2 }
    assert(got === expect)
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    import spark.implicits._
    val rnd = new Random(13)
    val fact = Seq.fill(500)((rnd.nextInt(10), rnd.nextInt(1000)))
      .toDF("fk", "payload")
    val dim = (0 until 10).map(i => (i, s"dim$i")).toDF("dk", "label")
    for (joinType <- Seq("inner", "left")) {
      val plain = fact.join(dim, fact("fk") === dim("dk"), joinType)
        .select("fk", "payload", "label")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Ops.saltedJoin(fact, dim, "fk", "dk", salts = 4, joinType)
        .select("fk", "payload", "label")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted === plain, joinType)
    }
  }

  test("saltedJoin spreads a 90%-hot key nearly uniformly over the salts") {
    import spark.implicits._
    val rnd = new Random(17)
    // 90% of rows share fk=1 — the celebrity-key shape saltedJoin exists for
    val fact = (0 until 10000).map { i =>
      (if (i % 10 != 0) 1 else 1 + rnd.nextInt(50), rnd.nextInt(1000000), i.toLong)
    }.toDF("fk", "payload", "seq")
    val salts = 8
    val hotBySalt = fact
      .withColumn("_salt", Ops.saltExpr(fact, "fk", salts))
      .filter($"fk" === 1)
      .groupBy("_salt").count()
      .collect().map(_.getLong(1))
    val hot = hotBySalt.sum.toDouble
    // every salt takes a share, and no reducer gets more than 2/salts of
    // the hot key (vs 100% unsalted) — the measured skew-spread claim
    assert(hotBySalt.length === salts)
    assert(hotBySalt.max / hot < 2.0 / salts,
      s"max salt share ${hotBySalt.max / hot} >= ${2.0 / salts}")
  }

  test("space-saving sketch: MG guarantees hold under eviction pressure") {
    import spark.implicits._
    val rnd = new Random(23)
    // zipfish stream: 5 true heavy hitters + a long tail of 500 rares,
    // forced through capacity 32 (far below 505 distinct items)
    val heavy = (0 until 5).flatMap(h => Seq.fill(400)(s"hot$h"))
    val tail = (0 until 2000).map(_ => s"cold${rnd.nextInt(500)}")
    val stream = rnd.shuffle(heavy ++ tail)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val cap = 32
    val summary = stream.toDF("item").repartition(8)
      .agg(graft.functions.sketch.heavyHitters($"item", cap).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.length <= cap)
    // every item with true frequency > n/cap must be present (all 5 hots:
    // 400 > 4020/32 ≈ 126)
    val items = summary.map(_._1).toSet
    (0 until 5).foreach(h => assert(items.contains(s"hot$h"), s"lost hot$h"))
    // count is an overestimate bounded by err: true <= cnt <= true + err
    summary.foreach { case (item, cnt, err) =>
      val t = truth(item)
      assert(cnt >= t, s"$item undercounted: $cnt < $t")
      assert(cnt <= t + err, s"$item: cnt $cnt > true $t + err $err")
    }
  }

  test("count-min sketch: overestimates only, and is partition-invariant") {
    import spark.implicits._
    val rnd = new Random(31)
    // zipfish stream over 2000 distinct items through a 4x256 grid —
    // collisions guaranteed (2000 items into 256 buckets per row)
    val stream = (0 until 8000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 40) s"hot${rnd.nextInt(5)}" else s"cold${rnd.nextInt(2000)}"
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val queries = (0 until 5).map(h => s"hot$h") ++
      (0 until 30).map(c => s"cold$c") :+ "never-seen"
    def estimates(parts: Int): Map[String, Long] =
      stream.toDF("item").repartition(parts)
        .agg(graft.functions.countmin.countMinEstimates(
          $"item", queries, depth = 4, width = 256).as("cm"))
        .select(explode($"cm").as("e"))
        .select($"e.item", $"e.est")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(8)
    // est >= true for every queried item, including absent ones (>= 0)
    queries.foreach { q =>
      val t = truth.getOrElse(q, 0L)
      assert(est(q) >= t, s"$q undercounted: ${est(q)} < $t")
      // and the excess is bounded by the full stream mass (sanity ceiling)
      assert(est(q) <= t + stream.size, s"$q: absurd estimate ${est(q)}")
    }
    // the grid is a commutative monoid: 1-partition and 8-partition runs
    // produce bit-identical estimates (the property MG summaries lack)
    assert(estimates(1) === est, "estimates changed with partitioning")
  }

  test("asofJoin picks the latest dim version at-or-before the fact time") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val fact = Seq((1L, 10L, ts(10)), (2L, 10L, ts(30)), (3L, 20L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val dim = Seq(
      (10L, ts(0), "v0"), (10L, ts(20), "v1"), (20L, ts(50), "late"))
      .toDF("user_id", "ts", "version")
    val got = Ops.asofJoin(fact, dim, "user_id", "ts", "ts")
      .select("event_id", "version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // event 1 (t=10): v0 in effect; event 2 (t=30): v1; event 3: no prior
    // version -> dropped (inner)
    assert(got === Map(1L -> "v0", 2L -> "v1"))
  }

  test("asofJoin ties on (key, ts) resolve deterministically to the greatest payload") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val fact = Seq((1L, 10L, ts(10))).toDF("event_id", "user_id", "ts")
    // two dim versions at the SAME (key, ts): LatestByOffsetAgg's strict
    // `>` would keep whichever merged first (partition-order dependent);
    // the tie rule collapses them to the greatest payload tuple BEFORE
    // the pick — repartition the dim both ways to prove order-independence
    val dimRows = Seq((10L, ts(5), "a"), (10L, ts(5), "z"))
    for (reversed <- Seq(false, true)) {
      val dim = (if (reversed) dimRows.reverse else dimRows)
        .toDF("user_id", "ts", "version").repartition(2)
      val got = Ops.asofJoin(fact, dim, "user_id", "ts", "ts")
        .select("event_id", "version").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "z"), s"reversed=$reversed: $got")
    }
  }

  test("asofJoin is row-preserving: exact-duplicate fact rows stay distinct") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // two IDENTICAL fact rows (at-least-once ingestion shape) must both
    // survive the enrich — a groupBy over fact columns alone merges them
    val fact = Seq((1L, 10L, ts(10)), (1L, 10L, ts(10)), (2L, 10L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val dim = Seq((10L, ts(0), "v0"), (10L, ts(20), "v1"))
      .toDF("user_id", "ts", "version")
    val got = Ops.asofJoin(fact, dim, "user_id", "ts", "ts")
      .select("event_id", "version").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.count(_ == (1L, "v0")) === 2, s"duplicate fact collapsed: $got")
    assert(got.count(_ == (2L, "v1")) === 1)
    assert(got.length === 3)
  }

  test("saltedJoin refuses dim-preserving join types; keys-only fact works") {
    import spark.implicits._
    val fact = Seq((1, 1), (1, 2)).toDF("fk", "payload")
    val dim = Seq((1, "a"), (2, "b")).toDF("dk", "label")
    // right/full outer would emit each unmatched dim row once per replica
    for (bad <- Seq("right", "right_outer", "full", "full_outer"))
      intercept[IllegalArgumentException] {
        Ops.saltedJoin(fact, dim, "fk", "dk", salts = 4, bad)
      }
    // a keys-only fact side has no payload to derive the salt from; the
    // positional fallback must still join correctly
    val keysOnly = Seq.fill(20)(1).toDF("fk")
    val got = Ops.saltedJoin(keysOnly, dim, "fk", "dk", salts = 4)
      .select("fk", "label").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.length === 20 && got.forall(_ == ((1, "a"))))
  }

  test("compact keeps multiple files for a skewed partition directory " +
      "and refuses FileStreamSink outputs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cpart").toString
    // one hot partition key: 4000 rows of k=hot, 10 of k=cold
    val df = ((1 to 4000).map(i => ("hot", i)) ++
      (1 to 10).map(i => ("cold", i))).toDF("k", "v")
    graft.engine.Layout.writePartitionedN(df, s"$dir/data", 4, "k")
    graft.engine.Layout.compact(spark, s"$dir/data", targetFiles = 4,
      partitionCols = Seq("k"))
    val hotFiles = new java.io.File(s"$dir/data/k=hot")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(hotFiles > 1 && hotFiles <= 4,
      s"hot directory collapsed to $hotFiles file(s)")
    assert(spark.read.parquet(s"$dir/data").count() === 4010L)
    // a FileStreamSink landing must be refused: swapping directories
    // orphans the _spark_metadata log's file list
    val sink = new java.io.File(s"$dir/sink"); sink.mkdirs()
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/sink/ignored")
    new java.io.File(s"$dir/sink/_spark_metadata").mkdirs()
    val err = intercept[IllegalArgumentException] {
      graft.engine.Layout.compact(spark, s"$dir/sink", 1)
    }
    assert(err.getMessage.contains("_spark_metadata"))
  }

  test("catalog refuses silently flipping a collection's kind") {
    val cat = new graft.engine.Catalog
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    cat.registerStream("clicks", df, Seq("id"))
    cat.registerStream("clicks", df, Seq("id")) // same kind: idempotent
    intercept[IllegalArgumentException] {
      cat.registerTable("clicks", df, Seq("id"))
    }
  }

  test("vector kernels fail ANALYSIS on array<double> instead of " +
      "returning silent garbage") {
    import graft.functions.GraftFunctions
    GraftFunctions.registerAll(spark)
    // array(0.1, 0.2) is array<double> — the kernels read float bytes, so
    // without the gate this returns garbage on unsafe rows, not an error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_cosine(array(0.1d, 0.2d), array(0.1d, 0.2d))")
        .collect()
    }
    assert(e.getMessage.contains("array<float>"))
    // the cast form works and returns exactly 1.0
    val ok = spark.sql(
      """SELECT graft_cosine(CAST(array(0.1, 0.2) AS ARRAY<FLOAT>),
                             CAST(array(0.1, 0.2) AS ARRAY<FLOAT>))""")
      .collect()(0).getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-9)
  }

  test("sorted intersect skips null elements instead of NPE/false-match") {
    import graft.functions.GraftFunctions
    GraftFunctions.registerAll(spark)
    val s = spark.sql(
      """SELECT graft_sorted_intersect_count(
           sort_array(array('a', CAST(NULL AS STRING), 'b')),
           sort_array(array('a', 'c')))""").collect()(0).getInt(0)
    assert(s === 1)
    val l = spark.sql(
      """SELECT graft_sorted_intersect_count(
           sort_array(array(CAST(NULL AS BIGINT), 0L, 7L)),
           sort_array(array(0L, 9L)))""").collect()(0).getInt(0)
    assert(l === 1) // the null must not read as 0 and match the real 0
  }

  test("minhash signature agreement estimates Jaccard similarity") {
    import spark.implicits._
    val rnd = new Random(17)
    // token sets with known overlap
    val base = (1 to 100).map(i => s"tok$i")
    val cases = Seq(0.9, 0.5, 0.2).map { keep =>
      val n = (100 * keep).toInt
      (base.take(n) ++ (1 to (100 - n)).map(i => s"other$i")).toSeq
    }
    val df = (Seq(base.toSeq) ++ cases).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }.toDF("id", "tokens")
      .select(col("id"),
        graft.functions.text.minhashFromHashes(
          graft.functions.text.shingleHashes(col("tokens"), w = 1), k = 256)
          .as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    Seq(1L -> 0.9, 2L -> 0.5, 3L -> 0.2).foreach { case (id, keep) =>
      val trueJ = keep / (2 - keep) // |A∩B| / |A∪B| with |A|=|B|=100
      val est = agree(sigs(0L), sigs(id))
      assert(math.abs(est - trueJ) < 0.12,
        s"id=$id est=$est true=$trueJ")
    }
  }

  test("two-level assignment: valid id, coarse-optimal, within-group optimal") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new Random(31)
    def cosArr(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    (1 to 10).foreach { trial =>
      val c = 65 + rnd.nextInt(150) // always above the flat threshold
      val dim = 8
      val cents = Array.tabulate(c)(i =>
        ((i * 3 + trial).toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val (coarse, gids, gcents) = graft.pipeline.Similarity.coarseGroups(cents)
      assert(gids.map(_.length).sum === c)       // partition: every cell grouped
      assert(gids.flatten.toSet === cents.map(_._1).toSet) // ...exactly once
      (1 to 50).foreach { _ =>
        val v = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
        val got = graft.functions.Kernels.nearestCellTwoLevel(
          new GenericArrayData(v), coarse, gids, gcents)
        // the chosen coarse group is argmax over coarse centroids
        val bg = coarse.indices.maxBy(g => (cosArr(v, coarse(g)), -g))
        assert(gids(bg).contains(got), "cell not from the optimal coarse group")
        // within that group, the chosen fine cell is argmax (first on ties)
        val inGroup = gids(bg).zip(gcents(bg))
        val best = inGroup.maxBy { case (id, cent) => (cosArr(v, cent), -id) }._1
        assert(got === best, "not within-group optimal")
      }
    }
  }

  test("aggregate buffers survive serialize/deserialize round trips") {
    // the partial->final exchange ships serialized buffers; a serde bug
    // silently corrupts results only in multi-partition plans
    val rnd = new Random(29)
    val topk = graft.functions.TopKByScore(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 5)
    (1 to 20).foreach { _ =>
      val buf = new TopKBuffer(5)
      Seq.fill(rnd.nextInt(30))((rnd.nextDouble(), rnd.nextInt(100).toLong))
        .foreach { case (s, id) => buf.add(s, id) }
      val back = topk.deserialize(topk.serialize(buf))
      assert(back.sortedPairs.toSeq === buf.sortedPairs.toSeq)
    }
    val vsum = graft.functions.VectorSumAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val vb = new graft.functions.VectorSumBuffer
    vb.sums = Array(1.5, -2.25, 3.125)
    val vback = vsum.deserialize(vsum.serialize(vb))
    assert(vback.sums.toSeq === vb.sums.toSeq)
    val empty = vsum.deserialize(vsum.serialize(new graft.functions.VectorSumBuffer))
    assert(empty.sums === null)
  }

  test("shingle hash count equals distinct shingle count") {
    import spark.implicits._
    val rnd = new Random(23)
    val docs = (1 to 30).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(60))(s"w${rnd.nextInt(20)}"))
    }
    val got = docs.toDF("id", "tokens")
      .select(col("id"),
        size(graft.functions.text.shingleHashes(col("tokens"), w = 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.foreach { case (id, ts) =>
      val expect = ts.sliding(3).map(_.mkString(" ")).toSet.size
      // sliding drops the short tail; kernel shingles whole when n<w
      val exp2 = if (ts.length < 3) 1 else expect
      assert(got(id) === exp2, s"id=$id")
    }
  }

  test("approx percentile (a15 scale path) stays within its rank-error bound") {
    import spark.implicits._
    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    // assert the estimate's actual rank against that bound per group
    val rnd = new Random(31)
    val vals = (1 to 5000).map(i => (s"g${i % 3}", rnd.nextDouble() * 1000))
    val df = vals.toDF("g", "v")
    val approx = df.groupBy("g").agg(
      expr("percentile_approx(v, 0.5, 1000)").as("p50"),
      expr("percentile_approx(v, 0.95, 1000)").as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    vals.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      val tol = n / 1000 + 1
      def rankOf(x: Double): Int = sorted.count(_ <= x)
      val (p50, p95) = approx(g)
      assert(math.abs(rankOf(p50) - 0.5 * n) <= tol + 1,
        s"$g p50 rank ${rankOf(p50)} of $n outside bound")
      assert(math.abs(rankOf(p95) - 0.95 * n) <= tol + 1,
        s"$g p95 rank ${rankOf(p95)} of $n outside bound")
    }
  }

  test("ngramLmScore matches a reference LM implementation on random corpora") {
    import spark.implicits._
    val rnd = new Random(29)
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(30))("w" + rnd.nextInt(12)).mkString(" ")))
    // reference: add-1 bigram LM over exact integer counts, quantized
    // per-bigram exactly like the engine
    val docBigrams = corpus.map { case (id, text) =>
      id -> text.split("\\s+").toSeq.sliding(2).map(p => (p(0), p(1))).toSeq }
    val c12 = docBigrams.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val v = c12.keySet.map(_._2).size.toLong
    val lp = c12.map { case (b, n) =>
      b -> math.floor(1e6 * math.log((n + 1).toDouble / (c1(b._1) + v))).toLong }
    val expected = docBigrams.map { case (id, bs) =>
      val s = bs.map(lp).sum; val n = bs.size.toLong
      (id, math.floor(s.toDouble / n).toLong, n)
    }.toSet
    val got = graft.pipeline.TextAnalysis.ngramLmScore(
      corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("containmentPairs matches a reference inverted-index implementation") {
    import spark.implicits._
    val rnd = new Random(31)
    // small alphabet + some verbatim embeddings → real containment hits
    val base = Seq.tabulate(20)(i =>
      Seq.fill(4 + rnd.nextInt(25))("w" + rnd.nextInt(10)))
    val corpus = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((100L, base(0) ++ base(1)), (101L, base(2).take(6)))
    def shingles(t: Seq[String]): Set[String] =
      if (t.size <= 3) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    val sh = corpus.map { case (id, t) => id -> shingles(t) }.toMap
    val df = sh.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).toSet }
    val rare = df.filter(_._2.size <= 5)
    val cand = for {
      (_, ids) <- rare.toSeq; a <- ids; b <- ids if a != b
    } yield (a, b)
    val expected = cand.distinct.flatMap { case (a, b) =>
      val c = sh(a).intersect(sh(b)).size.toDouble / sh(a).size
      val r = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (r >= 0.9) Some((a, b, r)) else None
    }.toSet
    val got = graft.pipeline.Dedup.containmentPairs(
      corpus.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text"),
      threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("hashedLinearScore matches its md5-parity reference on random docs") {
    import spark.implicits._
    def w(t: String): Long = TestHashes.tokenWeight(t)
    val rnd = new Random(37)
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))("tk" + rnd.nextInt(50))))
    val expected = corpus.map { case (id, t) =>
      (id, math.floor(1e6 * t.map(w).sum.toDouble / t.size).toLong, t.size.toLong)
    }.toSet
    val got = graft.pipeline.TextAnalysis.hashedLinearScore(
      corpus.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("cosinePre with precomputed norms is bit-identical to the fused cosine") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.Kernels
    val rnd = new Random(91)
    def arr(n: Int): GenericArrayData =
      new GenericArrayData(Array.fill(n)((rnd.nextDouble() * 4 - 2).toFloat))
    (1 to 200).foreach { i =>
      val n = 1 + rnd.nextInt(96)
      val a = arr(n); val b = arr(n)
      val fused = Kernels.cosine(a, b)
      val pre = Kernels.cosinePre(a, b, Kernels.norm(a), Kernels.norm(b))
      // bit-identical, not just close: the oracle hash-compare depends on it
      assert(java.lang.Double.doubleToLongBits(fused) ===
        java.lang.Double.doubleToLongBits(pre), s"iter=$i n=$n")
    }
    // zero-norm guard parity
    val z = new GenericArrayData(Array.fill(8)(0.0f))
    val v = arr(8)
    assert(Kernels.cosinePre(z, v, Kernels.norm(z), Kernels.norm(v)) === 0.0)
    assert(Kernels.cosine(z, v) === 0.0)
  }

  test("greedyPack matches the serial greedy reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(23)
    (1 to 5).foreach { iter =>
      val nDocs = 30 + rnd.nextInt(120)
      val budget = 8 + rnd.nextInt(40)
      val shards = 1 + rnd.nextInt(3)
      val docs = (1L to nDocs.toLong).map { i =>
        // token counts spanning under- and over-budget docs
        val n = 1 + rnd.nextInt(budget * 2)
        (i, (1 to n).map(t => s"w$t").mkString(" "), "en",
          s"src${rnd.nextInt(3)}")
      }
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val got = graft.pipeline.TextAnalysis.greedyPack(df, budget, shards)
        .collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getInt(2), r.getInt(3),
          r.getInt(4)))).toMap
      // serial reference: same md5 shard gate, greedy walk per group in
      // doc_id order
      def shardOf(id: Long): Int = TestHashes.shardOf(id, shards)
      val expected = docs
        .map { case (id, text, _, src) =>
          (id, src, shardOf(id), text.split("\\s+").length) }
        .groupBy { case (_, src, sh, _) => (src, sh) }
        .flatMap { case (_, group) =>
          var packSeq = -1; var rem = 0
          group.sortBy(_._1).map { case (id, src, sh, n) =>
            if (packSeq < 0 || n > rem) { packSeq += 1; rem = budget }
            rem -= n
            (id, (src, sh, n, packSeq))
          }
        }.toMap
      assert(got === expected, s"iter=$iter budget=$budget shards=$shards")
    }
  }
}
