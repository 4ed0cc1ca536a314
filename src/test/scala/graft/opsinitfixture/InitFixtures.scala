package graft.opsinitfixture

/** Bytecode fixtures for [[graft.OpsInitSpec]] — module shapes the
  * init-reference scanner must classify correctly. NOTHING in the test
  * suite may INITIALIZE the cyclic pair (the scanner reads .class bytes
  * only, never loads or inits): two threads touching CycA/CycB in
  * opposing orders is exactly the q226/q227 object-init-lock deadlock
  * this guard exists to prevent (SKILL.md "SECOND concurrency class";
  * fixed in round 14 by extracting Ols.scala, closed as a CLASS here). */

/** The q226/q227 shape: each object's val initializer reads the OTHER
  * module — the init graph contains the 2-cycle CycA ↔ CycB. */
object CycA { val a: Int = 1; val fromB: Int = CycB.b }
object CycB { val b: Int = 2; val fromA: Int = CycA.a }

/** The LEGITIMATE Ols shape: a one-way init-time read of a shared-core
  * module. An init DAG cannot deadlock (lock order is the topological
  * order) — the scanner must record the edge but NOT flag a cycle. */
object DagLeaf { val x: Int = 7 }
object DagUser { val y: Int = DagLeaf.x + 1 }

/** Method-time-only reference: no val initializer touches CycA, so no
  * init edge may be recorded (else every cross-object CALL would be
  * flagged and the graph would be all cycles). */
object MethodOnly { def g: Int = CycA.a + CycB.b }

/** Lambda-deferred reference inside a val initializer. The stored
  * function does NOT run at init, but the scanner follows invokedynamic
  * implementation methods CONSERVATIVELY (a `Seq(..).map(i => Other.f(i))`
  * initializer really does run its lambda at init, and the two cases are
  * statically indistinguishable without escape analysis) — so this edge
  * IS recorded, by design. */
object LambdaHolder { val f: () => Int = () => DagLeaf.x }

/** Init work routed through a private same-class helper — the scanner
  * must follow the call and still see the DagLeaf read. */
object HelperInit {
  private def helper(): Int = DagLeaf.x * 2
  val h: Int = helper()
}
