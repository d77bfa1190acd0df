package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Registry

/** Every oracle-checked query must be bit-deterministic across runs —
  * the driver hashes results, so any nondeterminism (unordered
  * collect_set in an output, map iteration order, float reduction order)
  * is a silent correctness-gate failure waiting to happen.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  Registry.all.filter(_.oracle.isDefined).foreach { q =>
    test(s"${q.name} is deterministic across runs") {
      // compare string renderings, not Rows: Scala Map equality is
      // unordered, so raw == would miss map-entry-order nondeterminism
      // that still changes serialized/hashed output
      val a = q.run(spark, TestSpark.sf0001).collect().toSeq.map(_.toString)
      val b = q.run(spark, TestSpark.sf0001).collect().toSeq.map(_.toString)
      assert(a == b, q.name)
    }
  }
}
