package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Future, Promise}

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Asynchronous request micro-batching on Structured Streaming — the
  * Spark-native re-expression of the reference's batching facility
  * (`/root/reference/src/grouper/core.clj:99-155`).
  *
  * Semantics preserved from the reference (SURVEY §2.1):
  *  - trigger disjunction: flush on interval elapsed (`core.clj:127-128`
  *    ≙ `Trigger.ProcessingTime`), on queue-full (`core.clj:42-44` ≙ the
  *    capacity buffer below), or on close-drain (`core.clj:58-66` ≙
  *    `processAllAvailable` + `stop`);
  *  - FIFO within a batch (`core.clj:129-130`): requests carry a sequence
  *    id and the batch is processed in id order;
  *  - positional result alignment with null padding (`core.clj:72-76`):
  *    a short result collection completes trailing requests with null;
  *  - scalar broadcast (`core.clj:73`): `startScalar` delivers one value
  *    to every member of the batch;
  *  - batch-granularity failure (`core.clj:80-83`): an exception inside
  *    the batch body fails every request of that batch (errback + failed
  *    future) without killing the stream;
  *  - closed rejection (`core.clj:40-41`): submit after close throws
  *    `RuntimeException("Grouper is closed")`;
  *  - backpressure (`core.clj:44`): submit blocks while `capacity`
  *    requests are outstanding.
  *
  * Deviations (documented, SURVEY §7.4): completion is observed per
  * micro-batch rather than per row, and micro-batches execute
  * sequentially (Spark's model) instead of on a concurrent pool — the
  * pool's parallelism maps to task parallelism inside each batch.
  */
final class Grouper[A, B] private (
    spark: SparkSession,
    runBatch: Dataset[A] => Either[B, Seq[B]],
    capacity: Int,
    intervalMs: Option[Long])(implicit encA: Encoder[A]) {

  private val seq = new AtomicLong(0L)
  private val running = new AtomicBoolean(true)
  private val pending = new ConcurrentHashMap[Long, (Promise[B], B => Unit, Throwable => Unit)]()
  private val lock = new Object
  // held-back submissions for interval=None (flush only on capacity/close)
  private val buffer = new ArrayBuffer[(Long, A)]

  private implicit val reqEnc: Encoder[(Long, A)] =
    Encoders.tuple(Encoders.scalaLong, encA)

  private val source = MemoryStream[(Long, A)](spark)(reqEnc)

  private val query: StreamingQuery = {
    import org.apache.spark.sql.functions.col
    source.toDS()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs.getOrElse(10L)))
      .foreachBatch { (batch: Dataset[(Long, A)], _: Long) =>
        val ordered = batch.orderBy(col("_1"))
        val ids = ordered.select(col("_1")).as(Encoders.scalaLong).collect()
        if (ids.nonEmpty) {
          try {
            val payloads = ordered.map(_._2)(encA)
            runBatch(payloads) match {
              case Left(scalar) =>
                ids.foreach(complete(_, scalar))
              case Right(results) =>
                // positional zip; pad missing tail with null (core.clj:74-76)
                ids.zipWithIndex.foreach { case (id, i) =>
                  complete(id, if (i < results.length) results(i) else null.asInstanceOf[B])
                }
            }
          } catch {
            case e: Throwable => ids.foreach(fail(_, e))
          }
          lock.synchronized(lock.notifyAll())
        }
        ()
      }
      .start()
  }

  private def complete(id: Long, value: B): Unit = {
    val entry = pending.remove(id)
    if (entry != null) {
      val (p, cb, _) = entry
      try cb(value) finally p.success(value)
    }
  }

  private def fail(id: Long, e: Throwable): Unit = {
    val entry = pending.remove(id)
    if (entry != null) {
      val (p, _, eb) = entry
      try eb(e) finally p.failure(e)
    }
  }

  def isRunning: Boolean = running.get() && query.isActive

  /** Submit one element; returns a future completed when the element's
    * micro-batch has been processed (the reference's promise,
    * `core.clj:45`). Blocks while `capacity` requests are outstanding. */
  def submit(elem: A, callback: B => Unit = _ => (),
      errback: Throwable => Unit = _ => ()): Future[B] = {
    if (!running.get()) throw new RuntimeException("Grouper is closed")
    lock.synchronized {
      while (pending.size() >= capacity) lock.wait(100)
    }
    val id = seq.getAndIncrement()
    val p = Promise[B]()
    pending.put(id, (p, callback, errback))
    lock.synchronized {
      if (intervalMs.isEmpty) {
        buffer += ((id, elem))
        if (buffer.length >= capacity) flushBuffer()
      } else source.addData((id, elem))
    }
    p.future
  }

  private def flushBuffer(): Unit = {
    if (buffer.nonEmpty) {
      source.addData(buffer.toSeq)
      buffer.clear()
    }
  }

  /** Graceful drain (`core.clj:58-66` / `shutdown!`): every accepted
    * request is processed before this returns. */
  def close(): Unit = {
    if (running.compareAndSet(true, false)) {
      lock.synchronized(flushBuffer())
      query.processAllAvailable()
      query.stop()
      query.awaitTermination()
    }
  }

  /** Reference alias (`core.clj:152-155`). */
  def shutdownAndDrain(): Unit = close()
}

object Grouper {

  private def validate(capacity: Int, intervalMs: Option[Long]): Unit = {
    require(capacity > 0, s"capacity must be a positive integer: $capacity")
    intervalMs.foreach(i => require(i > 0, s"interval must be a positive integer: $i"))
  }

  /** Start with a collection-result processor: results align positionally
    * with the batch's elements (`core.clj:102-105`). The processor sees
    * the micro-batch as a `Dataset[A]` in submission order and must
    * return rows 1:1 (short results are null-padded). */
  def start[A, B](spark: SparkSession,
      proc: Dataset[A] => Seq[B],
      capacity: Int,
      intervalMs: Option[Long] = Some(50L))(implicit encA: Encoder[A]): Grouper[A, B] = {
    validate(capacity, intervalMs)
    require(proc != null, "proc must be a function")
    new Grouper[A, B](spark, ds => Right(proc(ds)), capacity, intervalMs)
  }

  /** Start with a scalar-result processor: the single value is broadcast
    * to every element of the batch (`core.clj:73`, `test:65-68`). */
  def startScalar[A, B](spark: SparkSession,
      proc: Dataset[A] => B,
      capacity: Int,
      intervalMs: Option[Long] = Some(50L))(implicit encA: Encoder[A]): Grouper[A, B] = {
    validate(capacity, intervalMs)
    require(proc != null, "proc must be a function")
    new Grouper[A, B](spark, ds => Left(proc(ds)), capacity, intervalMs)
  }
}
