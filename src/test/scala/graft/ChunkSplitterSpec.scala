package graft

import graft.cdc.ChunkSplitter
import graft.cdc.ChunkSplitter.ChunkRange
import org.scalatest.funsuite.AnyFunSuite

/** Splitter math vs the reference semantics (MySqlChunkSplitter.java):
  * even/uneven dispatch, bound structure, and full key-space coverage. */
class ChunkSplitterSpec extends AnyFunSuite {

  private def coverage(chunks: Seq[ChunkRange], keys: Seq[Long]): Unit = {
    // every key in exactly one chunk
    keys.foreach { k =>
      assert(chunks.count(_.contains(k)) === 1, s"key $k")
    }
    // chunks tile the space: first lo=None, last hi=None, adjacent bounds meet
    assert(chunks.head.lo.isEmpty && chunks.last.hi.isEmpty)
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a.hi === b.lo)
      case _ =>
    }
  }

  test("distribution factor matches (max-min+1)/count") {
    assert(ChunkSplitter.distributionFactor(1, 100, 100) === 1.0)
    assert(ChunkSplitter.distributionFactor(1, 200, 100) === 2.0)
  }

  test("dense keys pick the arithmetic even split") {
    assert(ChunkSplitter.isEvenlyDistributed(1, 100, 100))
    val chunks = ChunkSplitter.splitEvenlySizedChunks(1, 100, 100, 25)
    assert(chunks.size === 4)
    coverage(chunks, 1L to 100L)
  }

  test("sparse keys (factor > upper bound) fall back to uneven split") {
    // factor = 10^6 / 100 = 10^4 > 1000
    assert(!ChunkSplitter.isEvenlyDistributed(1, 1000000, 100))
    val keys = (1L to 100L).map(_ * 10000)
    val chunks = ChunkSplitter.split(1, 1000000, 100, 30, () => keys.iterator)
    assert(chunks.size === 4) // cuts at ranks 30, 60, 90
    coverage(chunks, keys)
  }

  test("dynamic chunk step scales with key-space density") {
    // factor 2.0 at chunkSize 25 -> step 50 (getDynamicChunkSize semantics)
    assert(ChunkSplitter.dynamicChunkStep(1, 200, 100, 25) === 50L)
    assert(ChunkSplitter.dynamicChunkStep(1, 100, 100, 25) === 25L)
  }

  test("single chunk when the table is smaller than one chunk") {
    val chunks = ChunkSplitter.splitEvenlySizedChunks(5, 9, 5, 100)
    assert(chunks === Seq(ChunkRange(0, None, None)))
    val uneven = ChunkSplitter.splitUnevenlySizedChunks(
      Seq(5L, 6L, 7L).iterator, 100)
    assert(uneven === Seq(ChunkRange(0, None, None)))
  }

  test("sample-quantile split: skewed keys get balanced buckets") {
    // 90% of keys in [0,100), 10% in [1M, 1M+100) — arithmetic split would
    // put everything in one chunk; quantile cuts follow the density
    val keys = (0L until 900L) ++ (0L until 100L).map(_ + 1000000L)
    val chunks = ChunkSplitter.splitSampledChunks(keys, 10)
    assert(chunks.size === 10)
    coverage(chunks, keys)
    // no chunk holds more than ~2x its fair share of the sample
    val sizes = chunks.map(c => keys.count(c.contains))
    assert(sizes.max <= 200, sizes.toString)
  }

  test("sample-quantile split: duplicate-heavy sample dedupes cuts") {
    val keys = Seq.fill(500)(7L) ++ Seq.fill(500)(9L)
    val chunks = ChunkSplitter.splitSampledChunks(keys, 8)
    coverage(chunks, keys)
    assert(chunks.map(_.hi).distinct.size === chunks.size) // strict bounds
  }

  test("sample size follows the reference thresholds") {
    assert(ChunkSplitter.sampleSize(1000) === 1000)      // full sample
    assert(ChunkSplitter.sampleSize(1000000) === 50000)  // 5% sample
  }

  test("keys outside the observed [min,max] still land in a chunk") {
    val chunks = ChunkSplitter.splitEvenlySizedChunks(1, 100, 100, 25)
    assert(chunks.count(_.contains(-50L)) === 1)  // first chunk, lo=None
    assert(chunks.count(_.contains(1000L)) === 1) // last chunk, hi=None
  }

  test("configurable distribution-factor bounds flip the strategy") {
    // factor 2.0: even under default bounds, uneven when upper < 2
    assert(ChunkSplitter.isEvenlyDistributed(1, 200, 100))
    assert(!ChunkSplitter.isEvenlyDistributed(1, 200, 100, upper = 1.5))
    val keys = (1L to 100L).map(_ * 2)
    val chunks = ChunkSplitter.split(1, 200, 100, 30, () => keys.iterator,
      factorUpper = 1.5)
    // uneven split cuts at sample ranks, not arithmetic steps
    assert(chunks.size === 4)
    coverage(chunks, keys)
  }

  test("100 TB shape: 12B rows split into 1.5M chunks in O(chunks) time") {
    // 12e9 dense rows / 8096-row chunks — the planner math must stay
    // arithmetic (no per-chunk queries) and finish instantly
    val rows = 12000000000L
    val t0 = System.nanoTime()
    val chunks = ChunkSplitter.splitEvenlySizedChunks(1L, rows, rows,
      ChunkSplitter.DefaultChunkSize)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(chunks.size === (rows / ChunkSplitter.DefaultChunkSize + 1).toInt)
    // generous bound: this guards against accidentally quadratic chunk
    // construction (hours at 1.5M chunks), not absolute speed — the shared
    // host shows multi-second scheduler stalls that a tight bound trips on
    assert(ms < 60000.0, s"split took $ms ms")
    // bounds tile: every boundary meets its neighbor
    assert(chunks.head.lo.isEmpty && chunks.last.hi.isEmpty)
    assert(chunks(1000).hi === chunks(1001).lo)
  }

  test("query-driven uneven walk: dense keys yield exactly chunkSize-key ranges") {
    // simulated store: keys 1..9; nextChunkMax = max of the chunkSize
    // smallest keys >= lower
    val keys = (1L to 9L).toVector
    def nextMax(lower: Long, cs: Int): Option[Long] = {
      val g = keys.filter(_ >= lower).take(cs)
      if (g.isEmpty) None else Some(g.max)
    }
    val cs3 = ChunkSplitter.splitUnevenlyByQuery(1L, 9L, 3, nextMax(_, 3))
    assert(cs3.map(c => (c.lo, c.hi)) === Seq(
      (None, Some(4L)), (Some(4L), Some(7L)), (Some(7L), None)))
    assert(cs3.map(c => keys.count(c.contains)) === Seq(3, 3, 3))
    // chunkSize 1 must still advance (per-key chunks), not loop or collapse
    val cs1 = ChunkSplitter.splitUnevenlyByQuery(1L, 9L, 1, nextMax(_, 1))
    assert(cs1.size === 9)
    assert(cs1.map(c => keys.count(c.contains)).forall(_ === 1))
  }

  test("splitVector strategy: store-provided boundaries become ranges") {
    val cs = ChunkSplitter.splitByProvidedBoundaries(Seq(30L, 10L, 20L, 20L))
    assert(cs.map(c => (c.lo, c.hi)) === Seq(
      (None, Some(10L)), (Some(10L), Some(20L)), (Some(20L), Some(30L)),
      (Some(30L), None)))
  }

  test("sharded strategy: config.chunks ranges tile with unbounded extremes") {
    val cs = ChunkSplitter.splitFromShardRanges(Seq(
      (None, Some(100L)), (Some(100L), Some(250L)), (Some(250L), None)))
    assert(cs.map(c => (c.lo, c.hi)) === Seq(
      (None, Some(100L)), (Some(100L), Some(250L)), (Some(250L), None)))
    // rows past the metadata's edges are still covered
    assert(cs.exists(_.contains(Long.MinValue)) && cs.exists(_.contains(Long.MaxValue)))
  }

  test("tikv region split: region starts inside the row-id span cut chunks") {
    val cs = ChunkSplitter.splitByRegionBoundaries(
      regionStarts = Seq(-500L, 0L, 1000L, 2000L, 9999L), minId = 1L,
      maxId = 2500L)
    // -500/0 precede the span, 9999 follows it → cuts at 1000, 2000
    assert(cs.map(c => (c.lo, c.hi)) === Seq(
      (None, Some(1000L)), (Some(1000L), Some(2000L)), (Some(2000L), None)))
  }

  test("byte-based row budget: target bytes / avg row size, floored and capped") {
    // 64 MB target over 1 KB rows -> 65536 rows per chunk
    assert(ChunkSplitter.rowBudgetForBytes(64L << 20, 1024L) === 65536)
    // wide rows get proportionally fewer rows per chunk
    assert(ChunkSplitter.rowBudgetForBytes(64L << 20, 1 << 20) === 64)
    // a row wider than the whole target still yields one row per chunk
    assert(ChunkSplitter.rowBudgetForBytes(1L << 20, 10L << 20) === 1)
    // tiny rows cap at Int.MaxValue rather than overflowing
    assert(ChunkSplitter.rowBudgetForBytes(Long.MaxValue / 2, 1L)
      === Int.MaxValue)
    intercept[IllegalArgumentException] {
      ChunkSplitter.rowBudgetForBytes(0L, 1024L)
    }
    intercept[IllegalArgumentException] {
      ChunkSplitter.rowBudgetForBytes(1024L, 0L)
    }
  }

  test("mongo strategy selection: sharded > splitVector > sample") {
    val shard = Seq((Option.empty[Long], Some(5L)), (Some(5L), None))
    // sharded wins even when splitVector would be permitted
    assert(ChunkSplitter.splitMongoStyle(Some(shard), Some(Seq(1L, 2L)),
      sys.error("sample must not run"), 4).size === 2)
    // unsharded + splitVector permitted
    assert(ChunkSplitter.splitMongoStyle(None, Some(Seq(1L, 2L)),
      sys.error("sample must not run"), 4).size === 3)
    // neither → sample-quantile buckets
    val sampled = ChunkSplitter.splitMongoStyle(None, None,
      (1L to 100L), 4)
    assert(sampled.size === 4)
  }
}
