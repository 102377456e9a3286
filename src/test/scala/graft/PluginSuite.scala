package graft

import java.nio.file.Files

import graft.core.MrPlugin

/** Runtime plugin loading — the `mrworker wc.so` analog
  * (`/root/reference/src/main/mrworker.go:32-49`): resolve user job code by
  * name at process start instead of compile-time injection. */
class PluginSuite extends SparkSpec {

  test("plugin loaded by name runs identically to the compiled-in job") {
    val dir = Files.createTempDirectory("graft-plugin")
    Files.writeString(dir.resolve("a.txt"), "the quick brown fox the")
    Files.writeString(dir.resolve("b.txt"), "quick quick lazy dog")
    val glob = dir.toString + "/*.txt"

    val viaPlugin = MrPlugin.load("graft.apps.WcPlugin").job.run(spark, glob)
      .collect().toSet
    val compiled = graft.apps.ReferenceApps.wcJob.run(spark, glob)
      .collect().toSet
    assert(viaPlugin == compiled)
    assert(viaPlugin.contains(("quick", "3")) && viaPlugin.contains(("the", "2")))
  }

  test("missing plugin fails with the offending name, like the reference's Fatalf") {
    val e = intercept[IllegalArgumentException](MrPlugin.load("no.such.Plugin"))
    assert(e.getMessage.contains("no.such.Plugin"))
  }

  test("class that is not an MrPlugin is rejected, not cast blindly") {
    val e = intercept[IllegalArgumentException](MrPlugin.load("graft.apps.ReferenceApps"))
    assert(e.getMessage.contains("does not implement"))
  }
}
