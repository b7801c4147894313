package graft

/** Targeted log hygiene for the harness mains. */
object Logs {

  /** The pool-sized (≤50-row) rank windows in `hybridRrf`/`rankedSearch`
    * are documented performance-benign — the window input is a top-k pool,
    * never the corpus — but every execution logs WindowExec's "No Partition
    * Defined" warning, and the driver keeps only the LAST 2000 chars of
    * bench output, so the warnings were spending the budget the JSON line
    * needs (VERDICT r7 #4). Raise just that package's loggers to ERROR;
    * every other WARN still prints.
    */
  def silenceBenignWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
