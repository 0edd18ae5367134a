package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2 layer 3) — pure-function
  * properties over ScalaCheck generators; distributed analogs are pinned
  * by the operator specs.
  */
class PropertySpec extends AnyFunSuite {
  import graft.cal.BusdayCount
  import graft.dedup.{MinHash, NgramJaccard, SimHash}
  import org.apache.spark.unsafe.types.UTF8String

  private val day = Gen.choose(8000, 13000) // ~1991..2005 epoch days
  private val text = Gen.listOfN(30,
    Gen.oneOf("the", "spark", "row", "data", "join", "key", "scan", "x1"))
    .map(_.mkString(" "))

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
    }
  }

  test("busday_count is interval-additive: [a,c) = [a,b) + [b,c)") {
    val h = BusdayCount.defaultHolidays
    forAllN(Gen.zip(day, day, day)) { case (x, y, z) =>
      val Seq(a, b, c) = Seq(x, y, z).sorted
      assert(BusdayCount.count(a, c, h)
        == BusdayCount.count(a, b, h) + BusdayCount.count(b, c, h))
    }
  }

  test("busday_count reversal follows the (end,start] antisymmetry") {
    val h = BusdayCount.defaultHolidays
    forAllN(Gen.zip(day, day)) { case (x, y) =>
      val a = math.min(x, y); val b = math.max(x, y)
      // np.busday_count(b, a) = -(count over (a, b]) for a <= b
      assert(BusdayCount.count(b, a, h)
        == -BusdayCount.count(a + 1, b + 1, h))
    }
  }

  test("minhash signatures are deterministic and self-agree fully") {
    forAllN(text) { t =>
      val s1 = MinHash.signature(UTF8String.fromString(t), 16)
      val s2 = MinHash.signature(UTF8String.fromString(t), 16)
      assert(s1.sameElements(s2))
    }
  }

  test("jaccardSorted is symmetric, bounded, 1 on equal non-empty sets") {
    forAllN(Gen.zip(text, text)) { case (a, b) =>
      val ga = NgramJaccard.gramHashes(UTF8String.fromString(a), 2)
      val gb = NgramJaccard.gramHashes(UTF8String.fromString(b), 2)
      val j1 = NgramJaccard.jaccardSorted(ga, gb)
      val j2 = NgramJaccard.jaccardSorted(gb, ga)
      assert(j1 == j2 && j1 >= 0.0 && j1 <= 1.0)
      if (ga.numElements() > 0)
        assert(NgramJaccard.jaccardSorted(ga, ga) == 1.0)
    }
  }

  test("simhash is invariant under token permutation (order-free)") {
    val rnd = new scala.util.Random(7)
    forAllN(text) { t =>
      val perm = rnd.shuffle(t.split(" ").toList).mkString(" ")
      assert(SimHash.simhash(UTF8String.fromString(t))
        == SimHash.simhash(UTF8String.fromString(perm)))
    }
  }

  test("gram hash sets are sorted and distinct by construction") {
    forAllN(text) { t =>
      val g = NgramJaccard.gramHashes(UTF8String.fromString(t), 2)
      val arr = (0 until g.numElements()).map(g.getLong)
      assert(arr == arr.sorted && arr.distinct == arr)
    }
  }
}
