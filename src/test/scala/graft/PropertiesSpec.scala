package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.isoDayOfWeek
import graft.operators.Dedup

/** Property-style checks over generated inputs. Samples are drawn once with
  * a fixed seed and evaluated in a single Spark pass per property (a Spark
  * job per ScalaCheck case would be prohibitively slow). */
class PropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("isoDayOfWeek agrees with java.time over random dates 1970–2035") {
    val days = sample(Gen.listOfN(300, Gen.choose(0L, 24000L)))
    val dates = days.map(d => java.sql.Date.valueOf(LocalDate.ofEpochDay(d)))
    val rows = dates.toDF("d")
      .select($"d", isoDayOfWeek($"d").as("dow"),
        weekofyear($"d").as("woy"), dayofyear($"d").as("doy"))
      .collect()
    rows.foreach { r =>
      val ld = r.getDate(0).toLocalDate
      assert(r.getInt(1) == ld.getDayOfWeek.getValue)
      assert(r.getInt(2) == ld.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR))
      assert(r.getInt(3) == ld.getDayOfYear)
    }
  }

  test("sortedJaccard: bounded, symmetric, 1 iff equal, 0 iff disjoint") {
    val gen = for {
      a <- Gen.listOfN(12, Gen.choose(0L, 30L))
      b <- Gen.listOfN(12, Gen.choose(0L, 30L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val pairs = sample(Gen.listOfN(100, gen))
    val rows = pairs.toDF("a", "b")
      .select(
        Dedup.sortedJaccard($"a", $"b").as("jab"),
        Dedup.sortedJaccard($"b", $"a").as("jba"),
        $"a", $"b")
      .collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      val (jab, jba) = (r.getDouble(0), r.getDouble(1))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab == jba)
      val expect = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(math.abs(jab - expect) < 1e-12)
      if (a == b) assert(jab == 1.0)
      if (a.toSet.intersect(b.toSet).isEmpty) assert(jab == 0.0)
    }
  }

  test("intervalJoin equals the brute-force pair set on random events") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val all = sample(Gen.listOfN(300, Gen.zip(Gen.choose(1L, 10L), Gen.choose(0L, 2000L))))
    val (c, p) = all.splitAt(150)
    val clicks = c.zipWithIndex.map { case ((u, m), i) =>
      (i.toLong, u, new java.sql.Timestamp(base + m * 60000L)) }
    val purchases = p.zipWithIndex.map { case ((u, m), i) =>
      ((1000 + i).toLong, u, new java.sql.Timestamp(base + m * 60000L)) }
    val got = graft.streaming.EventStreams
      .intervalJoin(clicks.toDF("event_id", "user_id", "ts"),
        purchases.toDF("event_id", "user_id", "ts"))
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (cid, cu, cts) <- clicks
      (pid, pu, pts) <- purchases
      if cu == pu && pts.getTime >= cts.getTime && pts.getTime <= cts.getTime + 600000L
    } yield (cid, pid)).toSet
    assert(got == want)
  }

  test("idempotent dedup: dropDuplicates is a fixpoint and keeps one row per key") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.choose(0, 20), Gen.choose(0, 5)))
    val data = sample(gen)
    val df = data.toDF("k", "v")
    val once = Dedup.dropDuplicatesByKey(df, Seq("k"))
    assert(once.count() == data.map(_._1).distinct.size)
    assert(Dedup.dropDuplicatesByKey(once, Seq("k")).count() == once.count())
  }

  test("connectedComponents matches union-find on random graphs") {
    val n = 30
    val raw = sample(Gen.listOfN(50, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1))))
    val edges = raw.filter { case (a, b) => a != b }
    // reference union-find over the same edge list
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = verts.groupBy(find).flatMap { case (_, vs) =>
      val cid = vs.min
      vs.map(v => v.toLong -> (cid.toLong, vs.size.toLong))
    }
    val got = Dedup.connectedComponents(
        edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("jaroWinkler is symmetric, bounded, and exact on identity/disjoint pairs") {
    import graft.functions.JaroWinklerImpl.jw
    val word = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val pairs = sample(Gen.listOfN(400, Gen.zip(word, word)))
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: jw($a, $b) = $s")
      assert(s == jw(b, a), s"asymmetric: jw($a, $b) != jw($b, $a)")
      if (a == b && a.nonEmpty) assert(s == 1.0, s"identity: jw($a, $a) = $s")
    }
    // disjoint alphabets can never match
    assert(jw("aaaa", "bbbb") == 0.0)
    // monotone prefix bonus: sharing a longer prefix cannot reduce the
    // score relative to the same jaro with no shared prefix
    assert(jw("martha", "marhta") > jw("artham", "arhtam") - 1e-12)
  }
}
