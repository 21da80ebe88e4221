package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ctran.{Schemas, Transform}
import graft.functions.PortableHash
import graft.ops.{Dedup, Layout}

/** Property-based tests (SURVEY §5.2.2): the validation filter's
  * postconditions, the conservation invariant, insert idempotency, hash
  * domain bounds, and salted-join result identity — each over generated
  * inputs rather than fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge in the
    * offline cache): n independent draws from seeded generators. */
  private def forAllSampled[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen(Gen.Parameters.default, Seed(i.toLong * 7919)).get)
    }

  private val rawRowGen: Gen[(String, String, String, String, String, String, String, String)] =
    for {
      trip <- Gen.oneOf(Gen.choose(1, 99).map(_.toString), Gen.const(""))
      date <- Gen.oneOf("05-OCT-20", "28-FEB-21", "31-DEC-20", "", "garbage")
      act  <- Gen.oneOf(Gen.choose(-1000, 200000).map(_.toString), Gen.const(""))
      dir  <- Gen.oneOf(Gen.choose(-40, 400).map(_.toString), Gen.const(""), Gen.const("x"))
      vel  <- Gen.oneOf(Gen.choose(-10, 250).map(_.toString), Gen.const(""))
    } yield (trip, date, act, "4008", "45.5", "-122.6", dir, vel)

  private def enrich(rows: Seq[(String, String, String, String, String, String, String, String)]) =
    Transform.enrich(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple(_)), 2),
      Schemas.rawBreadcrumb))

  test("property: every validated row satisfies the F1-F5 contract") {
    forAllSampled(Gen.listOfN(60, rawRowGen)) { rows =>
      {
        val valid = enrich(rows).filter(Transform.isValid)
          .select($"trip_id", $"direction", $"speed", $"tstamp", $"svc_date")
          .collect()
        valid.foreach { r =>
          assert(!r.isNullAt(0) && !r.isNullAt(3))
          if (!r.isNullAt(1)) assert(r.getInt(1) >= 0 && r.getInt(1) <= 359)
          if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 200)
          val slack = r.getTimestamp(3).getTime - r.getDate(4).getTime
          assert(slack <= 48L * 3600 * 1000)
        }
      }
    }
  }

  test("property: conservation — consumed = kept + skipped") {
    forAllSampled(Gen.listOfN(80, rawRowGen)) { rows =>
      {
        val e = enrich(rows)
        val kept = e.filter(Transform.isValid).count()
        val skipped = e.filter(!Transform.isValid || Transform.isValid.isNull).count()
        assert(kept + skipped === rows.length.toLong)
      }
    }
  }

  test("property: portable hashes stay in [0, 2^60) for arbitrary strings") {
    forAllSampled(Gen.listOfN(50, Gen.asciiPrintableStr)) { strs =>
      {
        val hs = strs.toDF("s")
          .select(PortableHash.md5Long($"s").as("h"),
            PortableHash.rehash(PortableHash.md5Long($"s"), 7).as("r"))
          .collect()
        hs.foreach { r =>
          assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60))
          assert(r.getLong(1) >= 0L && r.getLong(1) < PortableHash.UhP)
        }
      }
    }
  }

  test("property: exact dedup partitions ids — keeps + dropped = all, copies sum") {
    forAllSampled(Gen.listOfN(40, Gen.oneOf("a b c", "d e f", "g h i", "j k l"))) { texts =>
      {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val d = Dedup.exact(docs, "doc_id", "text").collect()
        assert(d.map(_.getAs[Long]("n_copies")).sum === texts.length.toLong)
        assert(d.map(_.getAs[Long]("keep_id")).distinct.length === d.length)
      }
    }
  }

  test("property: session interval-merge invariants under random event order") {
    import graft.streaming.SessionState
    val gap = 100L
    forAllSampled(Gen.listOfN(40, Gen.choose(0L, 2000L)), n = 8) { times =>
      var sessions = List.empty[SessionState.OpenSession]
      times.foreach(t => sessions = SessionState.addEvent(sessions, t, gap))
      // every event is counted exactly once
      assert(sessions.map(_.n).sum === times.length.toLong)
      // sorted, well-formed, and separated by MORE than the gap
      sessions.foreach(s => assert(s.startMs <= s.endMs))
      sessions.sliding(2).foreach {
        case List(a, b) =>
          assert(a.endMs < b.startMs - gap,
            s"adjacent sessions within gap: $a | $b")
        case _ => ()
      }
      // bounds cover exactly the events; arrival ORDER never matters
      assert(sessions.map(_.startMs).min === times.min)
      assert(sessions.map(_.endMs).max === times.max)
      var reversed = List.empty[SessionState.OpenSession]
      times.reverse.foreach(t => reversed = SessionState.addEvent(reversed, t, gap))
      assert(reversed === sessions)
    }
  }

  test("property: salted join ≡ plain join for arbitrary key skew") {
    forAllSampled(Gen.zip(Gen.listOfN(60, Gen.choose(0, 5)), Gen.choose(2, 6))) { case (keys, salts) =>
      {
        val big = keys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "row")
        val small = (0 to 5).map(k => (k, s"d$k")).toDF("k", "attr")
        val plain = big.join(small, "k").select("k", "row", "attr")
        val salted = Layout.saltedJoin(big, small, "k", salts)
          .select("k", "row", "attr")
        assert(salted.count() === plain.count())
        assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
      }
    }
  }

  test("property: native as-of ≡ reference scan, all modes, random inputs") {
    import graft.plans.AsOfJoin
    // random left rows and (key, time)-unique right rows, few keys so
    // empty groups, singleton groups, and dense groups all occur
    val sides = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 50L))),
      Gen.listOfN(15, Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 50L))))
    forAllSampled(sides, n = 4) { case (lRows, rRowsRaw) =>
      val rRows = rRowsRaw.distinct // unique (key, time) build side
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "lid")
      val right = rRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "rid")
      // reference: per left row, linear scan over the right list
      def expect(back: Boolean, tol: Option[Long]) = lRows.zipWithIndex.map {
        case ((k, t), i) =>
          val cands = rRows.zipWithIndex.filter { case ((rk, rt), _) =>
            rk == k && (if (back) rt <= t else rt >= t) &&
              tol.forall(b => math.abs(rt - t) <= b)
          }
          val best =
            if (cands.isEmpty) None
            else if (back) Some(cands.maxBy(_._1._2)._2.toLong)
            else Some(cands.minBy(_._1._2)._2.toLong)
          i.toLong -> best
      }.toMap
      for (back <- Seq(true, false); tol <- Seq(None, Some(7L));
           hint <- Seq(AsOfJoin.Merge, AsOfJoin.Broadcast)) {
        val out =
          (if (back) AsOfJoin.backward(left, right, Seq("k"), "t", "t", tol, hint)
           else AsOfJoin.forward(left, right, Seq("k"), "t", "t", tol, hint))
            .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
        assert(out === expect(back, tol),
          s"mismatch back=$back tol=$tol hint=$hint")
      }
    }
  }
}
