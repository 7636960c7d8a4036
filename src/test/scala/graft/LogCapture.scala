package graft

/** Capture formatted log4j2 messages emitted under a logger name while a
  * body runs — the tool that lets specs PIN gate-decision logs (the
  * repo's greppability rule says every regime gate logs its decision;
  * without a capture the rule is only enforceable by eyeball).
  */
object LogCapture {
  import org.apache.logging.log4j.{Level, LogManager}
  import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
  import org.apache.logging.log4j.core.appender.AbstractAppender
  import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

  /** Run `body` with an INFO-level appender attached to `loggerName`
    * (children inherit); returns (result, captured messages). The
    * logger's previous level/config is restored afterwards.
    */
  def apply[A](loggerName: String)(body: => A): (A, Seq[String]) = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    val app = new AbstractAppender(s"spec-capture-${System.nanoTime()}",
        null, null, false, Array.empty[Property]) {
      override def append(e: LogEvent): Unit =
        msgs.synchronized { msgs += e.getMessage.getFormattedMessage }
    }
    app.start()
    val existing = cfg.getLoggerConfig(loggerName)
    val own = existing.getName == loggerName
    val lc =
      if (own) existing
      else {
        val n = new LoggerConfig(loggerName, Level.INFO, true)
        cfg.addLogger(loggerName, n)
        n
      }
    val prevLevel = lc.getLevel
    lc.setLevel(Level.INFO)
    lc.addAppender(app, Level.INFO, null)
    ctx.updateLoggers()
    try {
      val r = body
      (r, msgs.synchronized(msgs.toList))
    } finally {
      lc.removeAppender(app.getName)
      lc.setLevel(prevLevel)
      if (!own) cfg.removeLogger(loggerName)
      ctx.updateLoggers()
      app.stop()
    }
  }
}
