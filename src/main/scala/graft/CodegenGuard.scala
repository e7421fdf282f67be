package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Counts whole-stage-codegen compilation failures. When janino blows
  * its method/constant budget Spark logs `ERROR CodeGenerator` and
  * SILENTLY interprets the stage — correctness survives, throughput
  * dies (SURVEY §3 records the composed-PQ-encoder incident, caught
  * only by eyeballing bench stderr). A counting appender on the log4j2
  * root turns that silence into a number `Bench` publishes and specs
  * assert on.
  */
object CodegenGuard {
  private val fallbacks = new AtomicLong(0)

  private object Counter extends AbstractAppender(
    "graft-codegen-guard", null, null, false, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit =
      if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
        event.getLoggerName != null &&
        event.getLoggerName.contains("CodeGenerator"))
        fallbacks.incrementAndGet()
  }

  /** Attach the counter to the root logger config (idempotent). */
  def install(): Unit = synchronized {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    if (!Counter.isStarted) Counter.start()
    if (!config.getRootLogger.getAppenders.containsKey(Counter.getName)) {
      config.getRootLogger.addAppender(Counter, Level.ERROR, null)
      ctx.updateLoggers()
    }
  }

  def count: Long = fallbacks.get()

  def reset(): Unit = fallbacks.set(0)
}
