package graft

/** Selects the tool logging config (`graft/tool-log4j2.properties`) for
  * graft mains launched outside sbt (build.sbt injects the same `-D`
  * via `javaOptions` for forked run/test JVMs). The file is deliberately
  * NOT at log4j2's classpath-root default name, so the library jar never
  * overrides a downstream consumer's logging — tool JVMs must opt in.
  * Must run before the first `LogManager` touch: call as the first
  * statement of `main`. No-op when the launcher already chose a config.
  */
object ToolLogging {
  def init(): Unit =
    if (!sys.props.contains("log4j2.configurationFile")) {
      System.setProperty("log4j2.configurationFile",
        "classpath:graft/tool-log4j2.properties")
      ()
    }
}
