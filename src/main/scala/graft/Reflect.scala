package graft

/** Reflective instantiation shared by the CLI plan loader and the
  * transformation dispatcher — the `eval`-free analog of the reference's
  * class-from-name construction (taskrabbit/forklift `base/utils.rb:12-19`,
  * `plan.rb:33`): a Scala `object` (singleton MODULE$) or a zero-arg
  * class, looked up by fully-qualified name. */
object Reflect {
  def instantiate[A](className: String): A = {
    val inst =
      try Class.forName(className + "$").getField("MODULE$").get(null) // Scala object
      catch { case _: ClassNotFoundException | _: NoSuchFieldException =>
        Class.forName(className).getDeclaredConstructor().newInstance()
      }
    inst.asInstanceOf[A]
  }
}
