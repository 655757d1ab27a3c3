package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's recall-regression gate (VERDICT r10 #5): per-entry
  * deltas vs the prior artifact's stamps, with a loud flag on any
  * drop > 0.1 — proven here by injecting a regression rather than
  * waiting for a real one. */
class BenchRecallGateSpec extends AnyFunSuite {

  test("parse recovers the recall block from a real artifact summary line") {
    val line = """{"metric":"summary","value":122.3,"failed":0,""" +
      """"recall":{"q17b_ann_topk":0.9,"q17c_ivf_topk":0.96,"q17j_pq_topk":0.64},""" +
      """"slowest":{"q17l":{"min":15.0}}}"""
    val got = Bench.parseRecallBlock(line)
    assert(got == Map("q17b_ann_topk" -> 0.9, "q17c_ivf_topk" -> 0.96,
      "q17j_pq_topk" -> 0.64))
  }

  test("parse uses the LAST recall block (pass noise lines may precede the summary)") {
    val text = """{"recall":{"a":0.1}}""" + "\n" + """{"recall":{"a":0.8,"b":0.5}}"""
    assert(Bench.parseRecallBlock(text) == Map("a" -> 0.8, "b" -> 0.5))
  }

  test("parse degrades to empty on garbage, never throws") {
    assert(Bench.parseRecallBlock("not json at all") == Map.empty)
    assert(Bench.parseRecallBlock("""{"recall":{}}""") == Map.empty)
  }

  test("injected regression: a >0.1 drop trips the flag, smaller drift does not") {
    val prev = Map("q17b_ann_topk" -> 0.90, "q17c_ivf_topk" -> 0.96,
      "q17j_pq_topk" -> 0.64, "retired_entry" -> 0.5)
    val cur = Map("q17b_ann_topk" -> 0.75, // -0.15: must trip
      "q17c_ivf_topk" -> 0.95,             // -0.01: within tolerance
      "q17j_pq_topk" -> 0.70,              // improvement
      "brand_new_entry" -> 0.88)           // no baseline: no delta
    val (deltas, regressed) = Bench.recallDeltas(prev, cur)
    assert(regressed == Seq("q17b_ann_topk"))
    assert(deltas("q17b_ann_topk") == -0.15)
    assert(deltas("q17c_ivf_topk") == -0.01)
    assert(deltas("q17j_pq_topk") == 0.06)
    assert(!deltas.contains("brand_new_entry"), "no prior stamp ⇒ no delta")
    assert(!deltas.contains("retired_entry"), "retired entries carry no delta")
  }

  test("exactly -0.1 is tolerated; the flag is strictly greater-than") {
    val (_, regressed) = Bench.recallDeltas(Map("x" -> 0.8), Map("x" -> 0.7))
    assert(regressed.isEmpty, "-0.1 exactly must not trip the gate")
    val (_, r2) = Bench.recallDeltas(Map("x" -> 0.8), Map("x" -> 0.699))
    assert(r2 == Seq("x"))
  }

  test("the standing artifact in the repo root parses and carries the ANN stamps") {
    // the gate's real input: whatever BENCH_r{N}.json the driver last
    // committed — if its recall block ever stops parsing, the gate
    // silently degrades to no-baseline, so pin parseability here
    Bench.latestArtifact(new java.io.File("/root/repo")) match {
      case Some(f) =>
        val stamps = Bench.parseRecallBlock(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        assert(stamps.contains("q17b_ann_topk"), s"no ANN stamps parsed from ${f.getName}")
        stamps.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
      case None => // fresh checkout without artifacts: nothing to pin
    }
  }
}
