package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the execution-posture profile: the default profile must
  * reproduce exactly the settings the suite has always benched under
  * (bench parity), env overrides must land on the right confs, and the
  * cluster posture must oversize shuffle partitions for AQE coalescing.
  */
class SessionPostureSpec extends AnyFunSuite with BeforeAndAfterAll {

  test("default local posture reproduces the historical bench settings") {
    val m = Posture.local(32).confs
    assert(m("spark.sql.shuffle.partitions") == "32")
    assert(m("spark.sql.adaptive.enabled") == "true")
    // Spark's own defaults, restated not changed — applying the profile
    // must not alter any benched plan
    assert(m("spark.sql.autoBroadcastJoinThreshold") == (10L << 20).toString)
    assert(m("spark.sql.files.maxPartitionBytes") == (128L << 20).toString)
    assert(m("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(m("spark.sql.adaptive.skewJoin.skewedPartitionFactor") == "5.0")
    assert(m("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      == (256L << 20).toString)
  }

  // no live-session assertion here: Session.local is getOrCreate-based,
  // so a posture probe against a session another suite already built
  // would assert on THAT session's knobs (order-dependent flake); the
  // confs-map pin above covers the applied path — Session.local applies
  // exactly Posture.confs, nothing else

  test("env overrides land on the right confs without a rebuild") {
    val p = Posture.fromEnv(Posture.local(32), Map(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS" -> "4096",
      "SPARK_GRAFT_BROADCAST_MB" -> "64",
      "SPARK_GRAFT_MAX_PARTITION_MB" -> "256",
      "SPARK_GRAFT_SKEW_FACTOR" -> "3.0",
      "SPARK_GRAFT_SKEW_THRESHOLD_MB" -> "128"))
    assert(p.shufflePartitions == 4096)
    assert(p.broadcastThresholdBytes == 64L << 20)
    assert(p.maxPartitionBytes == 256L << 20)
    assert(p.skewFactor == 3.0)
    assert(p.skewThresholdBytes == 128L << 20)
    // and an empty env is the identity
    assert(Posture.fromEnv(Posture.local(32), Map.empty) == Posture.local(32))
  }

  test("cluster posture oversizes shuffle partitions for AQE coalescing") {
    val p = Posture.cluster(totalCores = 32000) // ~1000 executors × 32
    assert(p.shufflePartitions == 256000)
    assert(p.aqe, "AQE must stay on — the oversize relies on coalescing")
    assert(p.skewJoin)
  }
}
