package graft.ops

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-function properties of the round-16 evolution-merge machinery:
  * [[Layout.mergeEvolvedType]] (the recursive main⊕tip type merge under
  * the recorded staged-add paths), [[Layout.addedFieldPaths]] (the
  * record writer), and the `branch-adds=` line round-trip (dots and
  * URL-hostile characters in segment names must survive — '.' is the
  * path separator, so a literal dot encodes as %2E). No SparkSession:
  * these run in milliseconds and pin the algebra the rebase rests on. */
class EvolveMergeSpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (no scalatest bridge in the
    * offline cache — PropertySpec's own pattern): n independent draws
    * from seeded generators. */
  private def forAllSampled[A](gen: Gen[A], n: Int = 40)(
      body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen(Gen.Parameters.default, Seed(i.toLong * 7919)).get)
    }

  private def struct(fs: (String, DataType)*): StructType =
    StructType(fs.map { case (n, t) => StructField(n, t) })

  // ---- record line round-trip -------------------------------------

  test("branch-adds line round-trips adds and nested paths, including " +
      "segment names containing dots, pipes, commas, and spaces") {
    val segGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaLowerChar, Gen.oneOf('.', '|', ',', ' ', '%', 'é')))
      .map(_.mkString)
    val pathGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, segGen))
    forAllSampled(Gen.zip(Gen.listOf(segGen), Gen.listOf(pathGen))) {
      case (adds: List[String], widens: List[List[String]]) =>
        // the record lowercases on parse (names are case-insensitive)
        val a = adds.map(_.toLowerCase).toSet
        val w = widens.map(_.map(_.toLowerCase): Seq[String]).toSet
        val line = Layout.branchAddsLineOf(a, w)
        assert(!line.contains("\n"))
        val (pa, pw) = Layout.parseBranchAdds(Seq(line))
        assert(pa === a, s"adds round-trip through $line")
        assert(pw === w, s"widen paths round-trip through $line")
    }
  }

  // ---- addedFieldPaths --------------------------------------------

  test("addedFieldPaths emits exactly the paths present in the widened " +
      "side and absent from the base, one per added subtree root") {
    val base = struct("a" -> IntegerType,
      "s" -> struct("x" -> LongType))
    val widened = struct("a" -> IntegerType,
      "s" -> struct("x" -> LongType, "y" -> StringType,
        "sub" -> struct("p" -> DoubleType, "q" -> DoubleType)))
    assert(Layout.addedFieldPaths(base("s").dataType,
      widened("s").dataType, Seq("s")).toSet ===
      Set(Seq("s", "y"), Seq("s", "sub")),
      "a wholly-new sub-struct contributes ONE path — the subtree " +
        "rides with it")
    assert(Layout.addedFieldPaths(base("s").dataType,
      base("s").dataType, Seq("s")) === Nil)
  }

  // ---- mergeEvolvedType -------------------------------------------

  test("equal types merge to main's; unrecorded tip extras refuse; " +
      "recorded extras ride; main-only fields always ride") {
    val main = struct("a" -> IntegerType, "mx" -> DoubleType)
    val tip = struct("a" -> IntegerType, "by" -> StringType)
    // unrecorded: by is a main-side nested drop from the merge's view
    assert(Layout.mergeEvolvedType(main, tip, Seq("s"),
      Set.empty).isEmpty)
    // recorded: by rides, mx (main's own add) rides, order main-first
    val merged = Layout.mergeEvolvedType(main, tip, Seq("s"),
      Set(Seq("s", "by")))
    assert(merged.map(_.asInstanceOf[StructType].fieldNames.toSeq)
      === Some(Seq("a", "mx", "by")))
  }

  test("same-name conflicting types refuse at every depth; main-side " +
      "lossless primitive widening rides; narrowing refuses") {
    val mainDeep = struct("s" -> struct("c" -> StringType))
    val tipDeep = struct("s" -> struct("c" -> IntegerType))
    assert(Layout.mergeEvolvedType(mainDeep, tipDeep, Seq("t"),
      Set(Seq("t", "s", "c"))).isEmpty,
      "a recorded path never overrides a type conflict")
    // main retyped int -> long (lossless): the merge adopts main's
    assert(Layout.mergeEvolvedType(LongType, IntegerType, Seq("k"),
      Set.empty) === Some(LongType))
    // the narrowing direction refuses (the tip's wider values cannot
    // decode under main's narrower type)
    assert(Layout.mergeEvolvedType(IntegerType, LongType, Seq("k"),
      Set.empty).isEmpty)
  }

  test("property: for a random base, disjoint main-adds and recorded " +
      "tip-adds always merge to base ++ mainAdds ++ tipAdds") {
    val typeGen: Gen[DataType] =
      Gen.oneOf(IntegerType, LongType, StringType, DoubleType)
    val nameGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val fieldsGen = Gen.mapOf(Gen.zip(nameGen, typeGen)).map(_.toSeq)
    forAllSampled(Gen.zip(fieldsGen, fieldsGen, fieldsGen)) { case (b, m, t) =>
      // force the three name sets disjoint
      val base = b.toMap
      val mainAdds = m.toMap -- base.keys
      val tipAdds = t.toMap -- base.keys -- mainAdds.keys
      val main = struct((base.toSeq ++ mainAdds.toSeq): _*)
      val tip = struct((base.toSeq ++ tipAdds.toSeq): _*)
      val rec = tipAdds.keySet.map(n => Seq("col", n))
      val merged = Layout.mergeEvolvedType(main, tip, Seq("col"), rec)
      assert(merged.isDefined, "disjoint recorded adds must merge")
      val got = merged.get.asInstanceOf[StructType]
      assert(got.fieldNames.toSet ===
        base.keySet ++ mainAdds.keySet ++ tipAdds.keySet)
      // main's fields keep main's order and types; tip adds append
      assert(got.fieldNames.take(main.fields.length).toSeq ===
        main.fieldNames.toSeq)
      got.fields.foreach { f =>
        val want = mainAdds.get(f.name).orElse(base.get(f.name))
          .getOrElse(tipAdds(f.name))
        assert(f.dataType === want)
      }
    }
  }

  test("LEGACY widen record form (pre-round-16 bare column names) " +
      "authorizes every nested add under the column — the read-side " +
      "migration ADVICE r16 #2 asked for") {
    // a record written by the old build: bare column name, no path
    val legacy: Set[Seq[String]] = Set(Seq("s"))
    assert(Layout.widenAuthorizes(legacy, Seq("s", "y")))
    assert(Layout.widenAuthorizes(legacy, Seq("s", "deep")))
    assert(!Layout.widenAuthorizes(legacy, Seq("t", "y")),
      "a legacy entry authorizes only its own column's subtree")
    // the current format stays exact-path
    val current: Set[Seq[String]] = Set(Seq("s", "y"))
    assert(Layout.widenAuthorizes(current, Seq("s", "y")))
    assert(!Layout.widenAuthorizes(current, Seq("s", "z")))
    // end to end through the merge: main [s: {x}], tip [s: {x, y}],
    // record in the LEGACY form — the tip extra rides instead of
    // refusing as a main-side nested drop
    val main = struct("s" -> struct("x" -> IntegerType))
    val tip = struct("s" -> struct("x" -> IntegerType,
      "y" -> StringType))
    val merged = Layout.mergeEvolvedType(
      main.fields.head.dataType, tip.fields.head.dataType,
      Seq("s"), legacy)
    assert(merged.contains(tip.fields.head.dataType),
      s"legacy-recorded widen must merge, got $merged")
    // and an UNRECORDED extra still refuses
    assert(Layout.mergeEvolvedType(
      main.fields.head.dataType, tip.fields.head.dataType,
      Seq("s"), Set.empty[Seq[String]]).isEmpty)
  }

  test("branch-renames record line round-trips ids and URL-hostile " +
      "names, ascending by id") {
    val entries = Seq((7, "old col", "new:col"), (3, "käse", "K2"),
      (12, "a.b", "c|d"))
    val line = Layout.branchRenamesLineOf(entries)
    assert(line.startsWith("branch-renames="))
    val back = Layout.parseBranchRenames(Seq(line))
    assert(back === entries.sortBy(_._1))
    assert(Layout.parseBranchRenames(Nil) === Nil)
  }

  test("property: merge is idempotent — merging the merged type with " +
      "the same tip under the same record changes nothing") {
    val main = struct("a" -> IntegerType,
      "s" -> struct("x" -> LongType, "mx" -> DoubleType))
    val tip = struct("a" -> IntegerType,
      "s" -> struct("x" -> LongType, "by" -> StringType),
      "y" -> IntegerType)
    val rec = Set(Seq("s", "by"), Seq("y"))
    // top-level merge runs per-column in the rebase; emulate for `s`
    val m1 = Layout.mergeEvolvedType(main("s").dataType,
      tip("s").dataType, Seq("s"), rec).get
    val m2 = Layout.mergeEvolvedType(m1, tip("s").dataType,
      Seq("s"), rec).get
    assert(m1 === m2)
  }
}
