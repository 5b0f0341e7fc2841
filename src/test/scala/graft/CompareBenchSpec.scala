package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Parser + threshold rules of the round-over-round bench differ. */
class CompareBenchSpec extends AnyFunSuite {

  private val benchLine =
    """{"metric":"bench_total_sec","value":12.5,"unit":"sec",""" +
      """"queries":{"q01_agg":1.5,"q40_dedup":6.0},""" +
      """"shuffle":{"q01_agg":{"read":4291,"write":2937},""" +
      """"q40_dedup":{"read":3641684,"write":1771567}},"sf":"/x"}"""

  test("parses the raw Bench JSON line, normalizing keys to the qNN prefix") {
    val r = CompareBench.parse(benchLine)
    assert(r.wall == Map("q01" -> 1.5, "q40" -> 6.0))
    assert(r.read == Map("q01" -> 4291L, "q40" -> 3641684L))
    assert(r.write("q40") == 1771567L)
    // r10+ Bench prints short keys already — same normalized result
    val shortLine =
      """{"metric":"total","value":12.5,"unit":"sec","queries":{"q01":1.5,"q40":6.0},"sf":"/x"}"""
    assert(CompareBench.parse(shortLine).wall == r.wall)
  }

  test("parses a driver wrapper, including a truncated tail") {
    val wrapped =
      s"""{"n":8,"rc":0,"tail":"${benchLine.replace("\\", "\\\\").replace("\"", "\\\"")}\\n","parsed":null}"""
    val r = CompareBench.parse(wrapped)
    assert(r.wall("q40") == 6.0 && r.read("q40") == 3641684L)
    // a truncated tail loses the queries map and the first shuffle
    // entries — whatever byte entries survive must still parse
    val cut = wrapped.substring(0, wrapped.indexOf("q40_dedup") - 1)
    val truncated =
      """{"n":8,"rc":0,"tail":"},\"q40_dedup\":{\"read\":3641684,\"write\":1771567}},\"sf\":1}\n","parsed":null}"""
    val rt = CompareBench.parse(truncated)
    assert(rt.wall.isEmpty && rt.read == Map("q40" -> 3641684L))
    assert(cut.nonEmpty) // silence unused warning path
  }

  test("colliding qNN prefixes keep full names (mirrors Bench's guard)") {
    // Bench keeps FULL names on the printed line exactly when two query
    // names share a qNN prefix; normalizing both here would last-wins
    // collapse them into one key and drop a query from the gate
    val collide =
      """{"queries":{"q90_alpha":1.0,"q90_beta":2.0,"q91_solo":3.0},""" +
        """"shuffle":{"q90_alpha":{"read":200000,"write":1},""" +
        """"q90_beta":{"read":300000,"write":2}},"sf":"/x"}"""
    val r = CompareBench.parse(collide)
    assert(r.wall == Map("q90_alpha" -> 1.0, "q90_beta" -> 2.0, "q91" -> 3.0))
    assert(r.read == Map("q90_alpha" -> 200000L, "q90_beta" -> 300000L))
    // duplicate occurrences of the SAME full name (e.g. the bench line
    // captured twice in a tail) are not a collision — still normalized
    val dup = """{"queries":{"q90_alpha":1.0}} {"queries":{"q90_alpha":1.0}}"""
    assert(CompareBench.parse(dup).wall == Map("q90" -> 1.0))
  }

  test("byte floor scopes the comparison: KB-scale drift is not a regression") {
    // the rule CompareBench.main applies, asserted at the constant level
    // plus a representative calculation
    assert(CompareBench.ByteFloor == 102400L)
    val small = 4291L
    val smallDrifted = (small * 2.4).toLong // AQE band, must NOT flag
    assert(math.max(small, smallDrifted) <= CompareBench.ByteFloor)
    val big = 3641684L
    val bigDrifted = (big * 1.05).toLong // 5% > 2% tolerance, must flag
    assert(math.max(big, bigDrifted) > CompareBench.ByteFloor &&
      (bigDrifted - big).toDouble / big > CompareBench.ByteTol)
  }
}
