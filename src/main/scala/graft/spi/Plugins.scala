package graft.spi

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Classpath plugin discovery — the JVM-idiomatic analog of the
  * reference's runtime plugin loader (`spi/plugins/plugins.go`: dlopen a
  * shared object, look up `PluginInitialize`, hand it the extension
  * points; driven at startup by `internal/streamer.go:87-90` so every
  * plugin is registered BEFORE any interface implementation is
  * resolved).
  *
  * Where Go needs `plugin.Open`, the JVM already has a discovery
  * mechanism: `java.util.ServiceLoader`. A plugin jar dropped on the
  * classpath declares its initializer in
  * `META-INF/services/graft.spi.GraftPlugin` and gets every extension
  * point the reference exposes (`plugins.go:32-42`): sinks, naming
  * strategies, state storages. No code changes, no recompilation —
  * exactly the reference's deployment story.
  */
trait GraftPlugin {
  /** `PluginInitialize` analog: register whatever this plugin provides. */
  def initialize(points: ExtensionPoints): Unit
}

/** `plugins.go:32-42` ExtensionPoints. Each returns false if the name
  * was already taken (first registration wins, like the reference's
  * registry semantics) — a plugin can probe rather than clobber. */
trait ExtensionPoints {
  def registerSink(name: String, factory: () => graft.sinks.Sink): Boolean
  def registerNamingStrategy(name: String, strategy: NamingStrategy): Boolean
  def registerStateStorage(name: String, provider: StateStorageProvider): Boolean
}

/** Topic naming SPI (`spi/namingstrategy` + registry
  * `namingstrategyregistry.go:37-49`). Column-level so the name is
  * computed per-row inside codegen, never on the driver. */
trait NamingStrategy {
  def topicName(prefix: String, schemaName: Column, tableName: Column): Column
  def messageTopicName(prefix: String): String
}

/** State storage SPI (`spi/statestorage`): resolves where streaming
  * state/offsets live. In Spark the checkpoint directory IS the offset
  * store, so a provider maps config → checkpoint location and may
  * configure the session's state-store backend. */
trait StateStorageProvider {
  def checkpointLocation(spark: SparkSession, props: Map[String, String],
                         defaultDir: String): String
}

object NamingStrategies {
  /** `debezium.go:37-60` — the default strategy, pre-registered like the
    * reference's init-time `RegisterNamingStrategy(config.Debezium, …)`. */
  object Debezium extends NamingStrategy {
    def topicName(prefix: String, schemaName: Column, tableName: Column): Column =
      graft.model.Envelope.topicName(prefix, schemaName, tableName)
    def messageTopicName(prefix: String): String =
      graft.model.Envelope.messageTopicName(prefix)
  }

  @volatile private var registry: Map[String, NamingStrategy] =
    Map("debezium" -> Debezium)

  def register(name: String, s: NamingStrategy): Boolean = synchronized {
    if (registry.contains(name)) false
    else { registry = registry + (name -> s); true }
  }

  /** `topic.namingstrategy.type` dispatch (`constants.go:65`,
    * `wiremodules.go:73`). */
  def create(name: String): NamingStrategy =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"topic.namingstrategy.type: unknown strategy '$name' " +
        s"(have: ${registry.keys.mkString(",")})"))
}

object StateStorages {
  /** Built-ins mirror `statestorage.type` = file | rocksdb | none
    * (`constants.go:42-43` + the reference's file storage; rocksdb is
    * this engine's production state backend, SURVEY §2.9). */
  private val file: StateStorageProvider = (_, props, _) => {
    val p = props.getOrElse("statestorage.file.path", "")
    require(p.nonEmpty, "statestorage.file.path is mandatory for statestorage.type=file")
    p
  }
  private val rocksdb: StateStorageProvider = (spark, props, _) => {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val p = props.getOrElse("statestorage.file.path", "")
    require(p.nonEmpty, "statestorage.file.path is mandatory for statestorage.type=rocksdb")
    p
  }
  private val none: StateStorageProvider = (_, _, default) => default

  @volatile private var registry: Map[String, StateStorageProvider] =
    Map("file" -> file, "rocksdb" -> rocksdb, "none" -> none)

  def register(name: String, p: StateStorageProvider): Boolean = synchronized {
    if (registry.contains(name)) false
    else { registry = registry + (name -> p); true }
  }

  def create(name: String): StateStorageProvider =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"statestorage.type: illegal value '$name' (have: ${registry.keys.mkString(",")})"))
}

object Plugins {
  private object Points extends ExtensionPoints {
    def registerSink(name: String, factory: () => graft.sinks.Sink): Boolean = {
      // Sinks.register overwrites; preserve first-wins plugin semantics here
      val fresh = !exists(name)
      if (fresh) graft.sinks.Sinks.register(name, factory)
      fresh
    }
    // Membership check only — calling create() would invoke the factory,
    // and a factory that throws at construction would be misread as
    // "unregistered", letting a later plugin clobber the registration.
    private def exists(name: String): Boolean = graft.sinks.Sinks.contains(name)
    def registerNamingStrategy(name: String, s: NamingStrategy): Boolean =
      NamingStrategies.register(name, s)
    def registerStateStorage(name: String, p: StateStorageProvider): Boolean =
      StateStorages.register(name, p)
  }

  /** Discover and initialize every `GraftPlugin` on the classpath
    * (`streamer.go:87-90`: run before anything resolves registries).
    * Returns the loaded plugin class names, in discovery order.
    * Idempotent per class: a plugin seen before is not re-initialized
    * (ServiceLoader may be driven more than once per JVM — each pipeline
    * start — while the reference loads its .so files exactly once).
    */
  private val loadedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def load(loader: ClassLoader = Thread.currentThread().getContextClassLoader): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[GraftPlugin], loader).asScala.toSeq.flatMap { p =>
      val cls = p.getClass.getName
      if (loadedOnce.add(cls)) { p.initialize(Points); Some(cls) } else None
    }
  }
}
