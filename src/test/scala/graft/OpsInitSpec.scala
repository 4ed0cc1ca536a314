package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.xbean.asm9.{ClassReader, ClassVisitor, Handle, MethodVisitor, Opcodes}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Closes the Scala OBJECT-INIT deadlock class found in round 14: two
  * threads concurrently initializing modules whose val initializers read
  * EACH OTHER deadlock in the JVM's class-init locks (q226/q227 hung the
  * concurrent Verify when `TextOps` gained an init-time `Relational`
  * reference while `Relational` already read `TextOps.LengthPercentiles`;
  * fixed by extracting the shared core into `Ols.scala`). Until now only
  * a scaladoc convention prevented query #240 from reintroducing the
  * cycle — and the failure mode is a silent gate HANG, worse than a red
  * row.
  *
  * The guard is STATIC and deterministic (a two-thread race repro only
  * catches the deadlock when the interleaving cooperates): it parses the
  * compiled bytecode of every top-level `graft` module, collects the
  * module reads (`GETSTATIC Other$.MODULE$`) reachable from the module's
  * constructor — following same-class calls transitively and lambda
  * implementation methods conservatively (a `.map(i => Other.f(i))` val
  * initializer really runs its lambda at init; a stored closure does not,
  * but the two are statically indistinguishable) — and asserts the
  * resulting init-reference digraph is ACYCLIC. A DAG cannot deadlock:
  * every thread acquires init locks in topological order. One-way shared
  * cores (the `Ols` pattern) therefore stay legal; any cycle, however
  * long, fails the suite with the cycle path printed. */
class OpsInitSpec extends AnyFunSuite {

  /** classes dir containing `marker` (a resource path like
    * "graft/Tables.class"), located WITHOUT initializing anything. */
  private def classesDirOf(marker: String): Path = {
    val url = getClass.getClassLoader.getResource(marker)
    assert(url != null, s"marker resource $marker not on classpath")
    val p = Paths.get(url.toURI)
    marker.split('/').foldLeft(p)((x, _) => x.getParent)
  }

  /** Init-time module-reference edges A -> B (internal names, e.g.
    * "graft/ops/TextOps$") among top-level modules under `pkgPrefix`. */
  private def initEdges(classesDir: Path,
      pkgPrefix: String): Map[String, Set[String]] = {
    val moduleFiles: Map[String, Path] = {
      val s = Files.walk(classesDir)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".class"))
        .map { p =>
          val rel = classesDir.relativize(p).toString
            .stripSuffix(".class").replace(java.io.File.separatorChar, '/')
          (rel, p)
        }
        .filter { case (n, _) =>
          n.startsWith(pkgPrefix) && n.endsWith("$") &&
            !n.dropRight(1).contains("$") // top-level modules only
        }
        .toMap
      finally s.close()
    }
    moduleFiles.map { case (self, path) =>
      // per method: same-class callees (incl. lambda impl methods) and
      // foreign-module reads
      val callees = mutable.Map.empty[String, mutable.Set[String]]
      val reads = mutable.Map.empty[String, mutable.Set[String]]
      val inits = mutable.Set.empty[String]
      val cr = new ClassReader(Files.readAllBytes(path))
      cr.accept(new ClassVisitor(Opcodes.ASM9) {
        override def visitMethod(access: Int, name: String, desc: String,
            sig: String, ex: Array[String]): MethodVisitor = {
          val key = name + desc
          val c = callees.getOrElseUpdate(key, mutable.Set.empty)
          val r = reads.getOrElseUpdate(key, mutable.Set.empty)
          if (name == "<init>" || name == "<clinit>") inits += key
          new MethodVisitor(Opcodes.ASM9) {
            override def visitFieldInsn(op: Int, owner: String,
                fname: String, fdesc: String): Unit =
              if (op == Opcodes.GETSTATIC && fname == "MODULE$" &&
                  owner != self && moduleFiles.contains(owner)) r += owner
            override def visitMethodInsn(op: Int, owner: String,
                mname: String, mdesc: String, itf: Boolean): Unit =
              if (owner == self) c += (mname + mdesc)
            override def visitInvokeDynamicInsn(name: String, desc: String,
                bsm: Handle, bsmArgs: Object*): Unit =
              bsmArgs.foreach {
                case h: Handle if h.getOwner == self =>
                  c += (h.getName + h.getDesc)
                case _ => ()
              }
          }
        }
      }, ClassReader.SKIP_DEBUG | ClassReader.SKIP_FRAMES)
      // closure over same-class calls from the constructors
      val seen = mutable.Set.empty[String]
      val queue = mutable.Queue(inits.toSeq: _*)
      val out = mutable.Set.empty[String]
      while (queue.nonEmpty) {
        val m = queue.dequeue()
        if (seen.add(m)) {
          out ++= reads.getOrElse(m, Set.empty)
          callees.getOrElse(m, Set.empty).foreach(queue.enqueue(_))
        }
      }
      self -> out.toSet
    }
  }

  /** First cycle in the digraph, as a node path, if any. */
  private def findCycle(edges: Map[String, Set[String]]): Option[List[String]] = {
    val color = mutable.Map.empty[String, Int] // 0 white, 1 grey, 2 black
    val stack = mutable.ListBuffer.empty[String]
    def dfs(n: String): Option[List[String]] = color.getOrElse(n, 0) match {
      case 1 => Some((stack.dropWhile(_ != n) :+ n).toList)
      case 2 => None
      case _ =>
        color(n) = 1; stack += n
        val hit = edges.getOrElse(n, Set.empty).toSeq.sorted
          .iterator.flatMap(dfs).nextOption()
        if (hit.isEmpty) { color(n) = 2; stack.remove(stack.length - 1) }
        hit
    }
    edges.keys.toSeq.sorted.iterator.flatMap(dfs).nextOption()
  }

  test("fixture calibration: the scanner sees the q226-shape init cycle, " +
    "follows helper calls and lambda impls, and does NOT flag method-time " +
    "references or one-way (Ols-shape) init reads") {
    val edges = initEdges(classesDirOf("graft/OpsInitSpec.class"),
      "graft/opsinitfixture/")
    val e = (n: String) => edges.getOrElse(s"graft/opsinitfixture/$n$$", Set.empty)
      .map(_.stripPrefix("graft/opsinitfixture/").stripSuffix("$"))
    assert(e("CycA") === Set("CycB"))
    assert(e("CycB") === Set("CycA"))
    assert(e("DagUser") === Set("DagLeaf"))
    assert(e("DagLeaf") === Set.empty)
    assert(e("MethodOnly") === Set.empty) // method bodies don't run at init
    assert(e("LambdaHolder") === Set("DagLeaf")) // conservative, by design
    assert(e("HelperInit") === Set("DagLeaf")) // via the private helper
    val cyc = findCycle(edges)
    assert(cyc.isDefined, "the deliberate CycA<->CycB cycle must be found")
    assert(cyc.get.toSet === Set("graft/opsinitfixture/CycA$",
      "graft/opsinitfixture/CycB$"))
    // the DAG alone must be clean
    val dagOnly = edges.filter { case (k, _) => !k.contains("Cyc") }
      .map { case (k, v) => k -> v.filter(!_.contains("Cyc")) }
    assert(findCycle(dagOnly).isEmpty)
  }

  test("the graft module init-reference graph is ACYCLIC (q226/q227 " +
    "concurrent-init deadlock guard, closed as a class)") {
    val edges = initEdges(classesDirOf("graft/Tables.class"), "graft/")
    val withDeps = edges.filter(_._2.nonEmpty).toSeq.sortBy(_._1)
    info(s"${edges.size} modules scanned; init-time module reads:")
    withDeps.foreach { case (m, ds) =>
      info(s"  $m -> ${ds.toSeq.sorted.mkString(", ")}") }
    findCycle(edges).foreach { cyc =>
      fail("Init-reference CYCLE between modules — two threads " +
        "initializing these concurrently in opposing orders DEADLOCK " +
        "in the JVM class-init locks (the q226/q227 gate hang). Move " +
        "the shared init-time core into its own object (the Ols.scala " +
        s"pattern): ${cyc.mkString(" -> ")}")
    }
  }
}
