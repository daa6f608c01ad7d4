package graft

import graft.spi._
import org.scalatest.funsuite.AnyFunSuite

/** Test plugin — discovered ONLY through ServiceLoader metadata, never
  * referenced by name from the loading code (the point of the test). */
class TestDiscoveredPlugin extends GraftPlugin {
  def initialize(points: ExtensionPoints): Unit = {
    points.registerSink("plugin-test-sink", () => graft.sinks.NullSink)
    points.registerNamingStrategy("plugin-naming", new NamingStrategy {
      def topicName(prefix: String, s: org.apache.spark.sql.Column,
                    t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.concat_ws("-",
          org.apache.spark.sql.functions.lit(prefix), s, t)
      def messageTopicName(prefix: String): String = s"$prefix-message"
    })
    points.registerStateStorage("plugin-state", (_, _, default) => default + "/plugin")
    TestDiscoveredPlugin.initCount.incrementAndGet()
    ()
  }
}
object TestDiscoveredPlugin {
  val initCount = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** ServiceLoader plugin discovery (`spi/plugins/plugins.go` +
  * `internal/streamer.go:87-90` analog): a provider declared in
  * `META-INF/services/graft.spi.GraftPlugin` on the classpath registers
  * sinks / naming strategies / state storages with zero code changes.
  */
class PluginsSpec extends AnyFunSuite {

  /** Classpath fragment carrying ONLY the service declaration — the
    * plugin "jar". The class itself is on the test classpath; discovery
    * still flows exclusively through the ServiceLoader metadata. */
  private lazy val pluginLoader: ClassLoader = {
    val dir = java.nio.file.Files.createTempDirectory("graft-plugin")
    val svc = dir.resolve("META-INF/services")
    java.nio.file.Files.createDirectories(svc)
    java.nio.file.Files.write(svc.resolve("graft.spi.GraftPlugin"),
      "graft.TestDiscoveredPlugin\n".getBytes("UTF-8"))
    new java.net.URLClassLoader(Array(dir.toUri.toURL), getClass.getClassLoader)
  }

  test("plugins are discovered via META-INF/services and register all three extension points") {
    val loaded = Plugins.load(pluginLoader)
    assert(loaded.contains("graft.TestDiscoveredPlugin"))
    // sink resolves through the ordinary config dispatch fall-through
    assert(graft.sinks.Sinks.create("plugin-test-sink") === graft.sinks.NullSink)
    assert(graft.sinks.Sinks.fromConfig(Map("sink.type" -> "plugin-test-sink"))
      === graft.sinks.NullSink)
    // naming strategy resolves through topic.namingstrategy.type
    val ns = NamingStrategies.create("plugin-naming")
    assert(ns.messageTopicName("p") === "p-message")
    // state storage resolves through statestorage.type
    val loc = StateStorages.create("plugin-state")
      .checkpointLocation(null, Map.empty, "/ckpt")
    assert(loc === "/ckpt/plugin")
  }

  test("a second load is a no-op per plugin class (idempotent discovery)") {
    Plugins.load(pluginLoader)
    val before = TestDiscoveredPlugin.initCount.get()
    val again = Plugins.load(pluginLoader)
    assert(again.isEmpty)
    assert(TestDiscoveredPlugin.initCount.get() === before)
  }

  test("registration is first-wins: a plugin cannot clobber a built-in") {
    assert(!NamingStrategies.register("debezium", NamingStrategies.Debezium))
    assert(!StateStorages.register("file", (_, _, d) => d))
  }

  test("built-in naming strategy and state storages resolve by reference config keys") {
    assert(NamingStrategies.create("debezium").messageTopicName("graft") === "graft.message")
    assertThrows[IllegalArgumentException](NamingStrategies.create("kebab"))
    assertThrows[IllegalArgumentException](StateStorages.create("bogus"))
    assertThrows[IllegalArgumentException](
      StateStorages.create("file").checkpointLocation(null, Map.empty, "/d"))
    assert(StateStorages.create("none").checkpointLocation(null, Map.empty, "/d") === "/d")
  }
}
