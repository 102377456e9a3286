package graft.core

/** Runtime-loadable (map, reduce) pair — the JVM analog of the reference's
  * Go-plugin contract: `mrworker.go:32-49` (`loadPlugin`) opens a user
  * `.so` at startup and looks up its `Map`/`Reduce` symbols; here the
  * "shared object" is any class or Scala `object` on the classpath (or
  * shipped via `spark-submit --jars`) implementing this trait, and the
  * lookup is [[MrPlugin.load]] by fully-qualified name.
  *
  * This closes the one lifecycle gap between the facade and the reference:
  * [[graft.apps.MrRun]]'s built-in app table is compile-time constructor
  * injection, while the reference picks user code at process start from a
  * CLI argument. With `MrRun plugin:com.example.MyJob …` the engine does
  * the same — no recompile of graft to run third-party jobs.
  */
trait MrPlugin extends Serializable {
  def job: MapReduceJob
}

object MrPlugin {

  /** Resolve a fully-qualified name to a plugin instance. Accepts either a
    * Scala `object` (resolved through its `MODULE$` instance, with or
    * without the trailing `$`) or a class with a public no-arg
    * constructor — the two shapes user code naturally takes. Fails with
    * the offending name in the message, like the reference's
    * `log.Fatalf("cannot load plugin %v")`. */
  def load(name: String): MrPlugin = {
    // A Scala `object Foo` compiles to class `Foo$` holding `MODULE$`; the
    // mirror class `Foo` (static forwarders only) has neither MODULE$ nor a
    // usable constructor — so try the object shape first, then a plain
    // class with a no-arg constructor. The last real failure is chained as
    // the cause: "no such class" alone would send a user whose plugin's
    // INITIALIZER threw down the wrong debugging path.
    var lastFailure: Throwable = null
    val instance = Iterator(name + "$", name)
      .flatMap(n => scala.util.Try(Class.forName(n))
        .recoverWith { case e => lastFailure = e; scala.util.Failure(e) }.toOption)
      .flatMap(cls =>
        scala.util.Try(cls.getField("MODULE$").get(null))
          .orElse(scala.util.Try(cls.getDeclaredConstructor().newInstance()))
          .recoverWith { case e => lastFailure = e; scala.util.Failure(e) }.toOption)
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(
        s"cannot load plugin $name: no such class, or it has no object instance / no-arg constructor",
        lastFailure))
    instance match {
      case p: MrPlugin => p
      case other => throw new IllegalArgumentException(
        s"cannot load plugin $name: ${other.getClass.getName} does not implement ${classOf[MrPlugin].getName}")
    }
  }
}
