package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-parse helpers behind the bench/regime plumbing — no SparkSession. */
class ConfParsingSpec extends AnyFunSuite {

  test("parseConfPairs splits k=v;k=v, trims, keeps '=' inside values") {
    assert(Bench.parseConfPairs("a=1;b=x=y; c = 2 ;") ==
      Seq("a" -> "1", "b" -> "x=y", "c" -> " 2"))
    assert(Bench.parseConfPairs("") == Seq.empty)
  }

  test("parseConfPairs names the malformed entry instead of MatchError") {
    val e = intercept[IllegalArgumentException] {
      Bench.parseConfPairs("a=1;oops;b=2")
    }
    assert(e.getMessage.contains("'oops'"), e.getMessage)
    assert(e.getMessage.contains("key=value"), e.getMessage)
    // an empty key is malformed too ("=v" would silently set conf "")
    intercept[IllegalArgumentException] { Bench.parseConfPairs("=v") }
  }

  test("executor memory parses with MiB as the suffixless unit, like Spark") {
    // "4096" means 4096 MiB to Spark (byteStringAsMb), never 4096 bytes —
    // the bytes reading collapsed the derived broadcastBytes default to
    // its 64 MiB floor on any cluster that sets the conf suffixless
    assert(GraftConf.parseExecutorMemoryBytes("4096") == Some(4096L << 20))
    assert(GraftConf.parseExecutorMemoryBytes("4g") == Some(4096L << 20))
    assert(GraftConf.parseExecutorMemoryBytes("512m") == Some(512L << 20))
    assert(GraftConf.parseExecutorMemoryBytes("not-a-size") == None)
  }
}
