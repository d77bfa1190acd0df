package graft

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral parity with the reference's test harness
  * (/root/reference/main/test-mr.sh): crash recovery (crash.so, :284-330),
  * exactly-once *effective* execution (jobcount.so, :201-223), and task
  * parallelism (mtiming/rtiming, :147-198) — all provided by Spark's task
  * retry + scheduler, demonstrated here rather than reimplemented.
  */
object FaultToleranceSpec {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class FaultToleranceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("crash parity: a task that dies on first attempt is retried and the job completes") {
    val acc = spark.sparkContext.longAccumulator("successfulAttempts")
    FaultToleranceSpec.attempts.set(0)
    val out = spark.sparkContext.parallelize(1 to 1000, 4)
      .mapPartitions { it =>
        FaultToleranceSpec.attempts.incrementAndGet() // raw JVM counter: sees crashes
        acc.add(1)
        val tc = TaskContext.get()
        if (tc.partitionId() == 2 && tc.attemptNumber() == 0)
          throw new RuntimeException("simulated worker crash (crash.so parity)")
        it
      }
      .map(_.toLong).sum()
    assert(out == (1 to 1000).map(_.toLong).sum) // correct despite the crash
    assert(FaultToleranceSpec.attempts.get == 5) // 4 partitions + 1 retry ran
    // accumulators from the failed attempt are discarded — Spark's
    // exactly-once accounting (the jobcount.so guarantee)
    assert(acc.value == 4)
  }

  test("jobcount parity: retried work is not double-counted in results") {
    // the reference asserts map ran exactly 8 times for 8 files; Spark's
    // equivalent guarantee is that re-executed tasks don't duplicate
    // output rows, even when side-effect counters see extra attempts
    val acc = spark.sparkContext.longAccumulator("rowsSeen")
    val n = spark.sparkContext.parallelize(1 to 400, 4)
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc.partitionId() == 1 && tc.attemptNumber() == 0)
          throw new RuntimeException("crash after partial work")
        it.map { x => acc.add(1); x }
      }
      .count()
    assert(n == 400) // exactly-once effective row count
  }

  test("mtiming parity: tasks actually run concurrently on the executor") {
    val spans = spark.sparkContext.parallelize(1 to 4, 4)
      .mapPartitions { _ =>
        val start = System.nanoTime()
        Thread.sleep(400)
        Iterator((start, System.nanoTime()))
      }.collect()
    val overlaps = spans.combinations(2).count {
      case Array((s1, e1), (s2, e2)) => s1 < e2 && s2 < e1
    }
    assert(overlaps > 0, "at least two tasks overlapped in time")
  }
}
