package graft

import scala.sys.process._

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
    val out = new StringBuilder
    val logger = ProcessLogger(
      line => out.synchronized { out.append(line).append('\n') },
      line => out.synchronized { out.append(line).append('\n') })
    // SPARK_HOME for the in-process standalone Worker's executor launch;
    // SPARK_SCALA_VERSION because the launcher's command builder calls
    // getScalaVersion() unconditionally and, without the env that
    // bin/load-spark-env.sh would set, scans for non-existent
    // launcher/target build dirs ("Cannot find any build directories").
    val proc = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark",
      "SPARK_SCALA_VERSION" -> "2.13").run(logger)
    // Bounded wait: a deadlocked local-cluster child (executor relaunch
    // loop, port exhaustion) must FAIL the suite with its output tail,
    // not hang it — poll for exit with a hard deadline, then destroy.
    val deadline = System.currentTimeMillis() + 10 * 60 * 1000L
    while (proc.isAlive() && System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    if (proc.isAlive()) {
      proc.destroy()
      fail("ChaosKillMain did not exit within 10 minutes; output tail:\n" +
        out.synchronized(out.toString)
          .linesIterator.toSeq.takeRight(30).mkString("\n"))
    }
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
