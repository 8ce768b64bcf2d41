package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executor-kill chaos gate (the reference's crash test,
  * `/root/reference/src/main/test-mr.sh:283-330`): spawn
  * [[ChaosKillMain]] in its OWN JVM (local-cluster needs a dedicated
  * SparkContext; the killed executors are grandchild processes), and
  * assert the machine-readable verdict: chaos output equal to the
  * failure-free run AND to the mr_wordcount gate, with at least one
  * executor actually removed and at least one task failure observed —
  * i.e. the kill landed and the recovery machinery, not luck, produced
  * the equality. */
class ChaosKillSpec extends AnyFunSuite {

  test("executor JVM killed mid-job: output equals the failure-free run") {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED")
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.ChaosKillMain", "/root/testdata/sf0.01")
    // java.lang.ProcessBuilder (not scala.sys.process) so the timeout
    // path can force-kill the whole PROCESS TREE: a SIGTERM to the
    // launcher alone can orphan the forked local-cluster child JVM —
    // the exact orphaned-JVM pathology that corrupted a round-9 bench
    // measurement on this box (BASELINE round-9 instrument note).
    // SPARK_HOME for the in-process standalone Worker's executor launch;
    // SPARK_SCALA_VERSION because the launcher's command builder calls
    // getScalaVersion() unconditionally and, without the env that
    // bin/load-spark-env.sh would set, scans for non-existent
    // launcher/target build dirs ("Cannot find any build directories").
    import scala.jdk.CollectionConverters._
    val pb = new _root_.java.lang.ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val gobbler = new Thread(() => {
      val br = new _root_.java.io.BufferedReader(
        new _root_.java.io.InputStreamReader(proc.getInputStream))
      Iterator.continually(br.readLine()).takeWhile(_ != null)
        .foreach(l => out.synchronized { out.append(l).append('\n') })
    })
    gobbler.setDaemon(true)
    gobbler.start()
    // Bounded wait: a deadlocked local-cluster child (executor relaunch
    // loop, port exhaustion) must FAIL the suite with its output tail,
    // not hang it — and must not leave grandchildren running under the
    // next measurement.
    val finished = proc.waitFor(10, _root_.java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) {
      proc.toHandle.descendants().iterator().asScala
        .foreach(_.destroyForcibly())
      proc.destroyForcibly()
      proc.waitFor(30, _root_.java.util.concurrent.TimeUnit.SECONDS)
      fail("ChaosKillMain did not exit within 10 minutes " +
        "(process tree force-killed to avoid orphaned executor JVMs " +
        "polluting later measurements); output tail:\n" +
        out.synchronized(out.toString)
          .linesIterator.toSeq.takeRight(30).mkString("\n"))
    }
    gobbler.join(10000)
    val exit = proc.exitValue()
    val text = out.synchronized(out.toString)
    val verdict = text.linesIterator.find(_.startsWith("CHAOSKILL "))
      .getOrElse(fail(s"no CHAOSKILL verdict line (exit $exit); tail:\n" +
        text.linesIterator.toSeq.takeRight(30).mkString("\n")))
    assert(exit == 0, s"child exited $exit; verdict: $verdict")
    val kv = verdict.split(' ').drop(1)
      .map(_.split('=')).collect { case Array(k, v) => k -> v }.toMap
    assert(kv("equal") == "true",
      s"chaos output diverged from failure-free run: $verdict")
    assert(kv("gate_equal") == "true",
      s"chaos output diverged from the mr_wordcount gate: $verdict")
    assert(kv("removed").toInt >= 1,
      s"no executor was removed — the kill never landed: $verdict")
    assert(kv("failed_tasks").toInt >= 1,
      s"no task failure observed — recovery machinery unexercised: $verdict")
  }
}
