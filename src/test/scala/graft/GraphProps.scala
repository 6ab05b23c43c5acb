package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Graph

/** ScalaCheck properties for the driver-local union-find finish
  * (path-halving find + union-by-min) — the piece of the
  * connected-components threshold path that runs OUTSIDE Spark, so the
  * engine-vs-oracle sweeps never exercise it on anything but fixture
  * shapes. GraphSpec pins one planted graph; these pin the algorithm
  * against an independent Spark-free reference (iterated edge
  * relaxation to fixpoint) on random graphs, including the two
  * documented contract corners: edge endpoints ABSENT from the node
  * list (they must still conduct connectivity and may even be the
  * component min — `getOrElseUpdate` makes them singleton roots, not
  * crashes) and ids at the extremes of the Long domain (the algorithm
  * is pure pointer arithmetic; nothing may overflow or wrap).
  */
object GraphProps extends Properties("GraphUnionFind") {

  // node ids: mostly small (dense collisions), sometimes extreme — the
  // distributed detector's overflow fix (DECIMAL(38,0) label sums) has
  // its own GraphSpec kill test; here extremes pin the LOCAL finish
  private val id: Gen[Long] = Gen.frequency(
    8 -> Gen.chooseNum(0L, 24L),
    1 -> Gen.chooseNum(Long.MaxValue - 8L, Long.MaxValue),
    1 -> Gen.chooseNum(Long.MinValue, Long.MinValue + 8L))

  private val graph: Gen[(Array[Long], Array[(Long, Long)])] = for {
    ids <- Gen.containerOf[Set, Long](id)
    // endpoints drawn from the SAME generator, not from ids: some edges
    // touch nodes outside the node list on purpose
    es <- Gen.listOf(Gen.zip(id, id))
  } yield (ids.toArray, es.toArray)

  /** Independent reference: relax every edge until no label changes.
    * Components form over ids ∪ endpoints (an absent endpoint still
    * conducts), label = min member id — the same contract
    * unionFindLocal documents. O(V·E) per case, fine at gen sizes.
    */
  private def reference(ids: Array[Long], es: Array[(Long, Long)]): Map[Long, Long] = {
    val all = (ids ++ es.flatMap(e => Seq(e._1, e._2))).distinct
    val lbl = scala.collection.mutable.HashMap(all.map(i => i -> i): _*)
    var changed = true
    while (changed) {
      changed = false
      es.foreach { case (a, b) =>
        val m = math.min(lbl(a), lbl(b))
        if (lbl(a) != m) { lbl(a) = m; changed = true }
        if (lbl(b) != m) { lbl(b) = m; changed = true }
      }
      // min-label relaxation needs the propagation closed transitively:
      // rewrite every label through itself until stable
      all.foreach { i =>
        val through = lbl.getOrElse(lbl(i), lbl(i))
        if (through < lbl(i)) { lbl(i) = through; changed = true }
      }
    }
    ids.map(i => i -> lbl(i)).toMap
  }

  property("labels equal the min reachable id (vs edge-relaxation reference)") =
    forAll(graph) { case (ids, es) =>
      Graph.unionFindLocal(ids, es) == reference(ids, es)
    }

  property("result is invariant to edge order and direction") =
    forAll(graph, Gen.chooseNum(0L, Long.MaxValue)) { case ((ids, es), seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(es.toSeq)
        .map(e => if (rnd.nextBoolean()) e.swap else e).toArray
      Graph.unionFindLocal(ids, shuffled) == Graph.unionFindLocal(ids, es)
    }

  property("every label is a component member and never exceeds its node") =
    forAll(graph) { case (ids, es) =>
      val got = Graph.unionFindLocal(ids, es)
      got.forall { case (i, l) => l <= i } &&
        // connected ids share labels transitively: relabeling through
        // the result map is already stable (labels are roots)
        got.values.forall(l => got.getOrElse(l, l) == l)
    }
}
