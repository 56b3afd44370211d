package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}

/**
 * External-worker transform: the Spark-native analog of
 * `mapInPandas` / the Python-UDF worker loop, over the same Arrow IPC
 * wire format. Per partition, rows serialize to self-describing Arrow
 * record batches ([[GraftBridge.toArrowBatches]] — the S11 export
 * path), stream to a worker SUBPROCESS over stdin, and transformed
 * batches stream back on stdout; executors decode their own return
 * batches ([[GraftBridge.fromArrowBatchesRdd]]), so nothing funnels
 * through the driver.
 *
 * Wire protocol (both directions): 4-byte big-endian length prefix,
 * then that many bytes of one Arrow IPC batch; stdin close = end of
 * partition. A byte-identity worker (`cat`) therefore exercises the
 * ENTIRE loop — framing, subprocess lifecycle, Arrow round-trip —
 * which is what the spec gates (the sandbox ships no Python; a pandas
 * worker is the same protocol with a transform between read and
 * write, exactly how Spark's own Python runner is shaped).
 *
 * Deadlock/lifecycle discipline (the SubprocessSource lessons):
 * frames WRITE on a daemon thread while the task thread READS — a
 * worker that streams never blocks on a full pipe; stderr drains on
 * its own daemon thread into the error message; a worker that exits
 * nonzero or truncates mid-frame fails the task loudly, never hangs.
 */
object ExternalTransform {

  def mapPartitionsViaWorker(df: DataFrame, command: Seq[String],
      maxRecordsPerBatch: Long = 4096L): DataFrame = {
    val spark = df.sparkSession
    val in = GraftBridge.toArrowBatches(df, maxRecordsPerBatch)
    val out = in.mapPartitions { batches =>
      if (!batches.hasNext) Iterator.empty
      else pipeFrames(batches, command)
    }
    // empty input ⇒ the worker never ran ⇒ its output schema is
    // unknowable; the input schema is the documented fallback
    GraftBridge.fromArrowBatchesRdd(spark, out, df.schema)
  }

  /** Stream length-prefixed frames through `command`; returns the
    * worker's output frames. Materializes only one frame at a time in
    * each direction. */
  private[operators] def pipeFrames(frames: Iterator[Array[Byte]],
      command: Seq[String]): Iterator[Array[Byte]] = {
    val pb = new ProcessBuilder(command: _*)
    val proc = pb.start()
    // a partially-consumed output iterator (limit/take, or the schema
    // probe) must not leak a blocked worker: kill it at task end
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        if (proc.isAlive) proc.destroyForcibly()))
    // upstream iterator failures happen on the writer thread — carry
    // them to the task thread, or the worker sees a clean stdin close
    // and the task "succeeds" on silently truncated output
    val writerFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val stderr = new java.io.ByteArrayOutputStream()
    val stderrThread = new Thread(() => {
      val buf = new Array[Byte](4096)
      val es = proc.getErrorStream
      var n = es.read(buf)
      while (n >= 0) { stderr.write(buf, 0, n); n = es.read(buf) }
    }, "graft-worker-stderr")
    stderrThread.setDaemon(true)
    stderrThread.start()

    val writer = new Thread(() => {
      val os = new java.io.BufferedOutputStream(proc.getOutputStream)
      try {
        frames.foreach { f =>
          val len = java.nio.ByteBuffer.allocate(4).putInt(f.length).array()
          os.write(len); os.write(f)
        }
        os.flush()
      } catch {
        case _: java.io.IOException => () // worker closed its stdin early;
          // the read side surfaces the real failure (exit code / stderr)
        case t: Throwable => // upstream Spark iterator failed mid-stream:
          writerFailure.set(t) // record it and kill the worker so the
          proc.destroyForcibly() // read side fails instead of finishing
      } finally {
        try os.close() catch { case _: java.io.IOException => () }
      }
    }, "graft-worker-stdin")
    writer.setDaemon(true)
    writer.start()

    val is = new java.io.DataInputStream(
      new java.io.BufferedInputStream(proc.getInputStream))

    new Iterator[Array[Byte]] {
      private var nextFrame: Array[Byte] = _
      private var done = false

      private def fetch(): Unit = {
        if (done || nextFrame != null) return
        val lenBuf = new Array[Byte](4)
        val got = read(lenBuf)
        if (got == 0) { finish(); return } // clean EOF between frames
        if (got < 4) fail(s"truncated frame length ($got of 4 bytes)")
        val len = java.nio.ByteBuffer.wrap(lenBuf).getInt
        if (len < 0 || len > (1 << 30)) fail(s"implausible frame length $len")
        val frame = new Array[Byte](len)
        val body = read(frame)
        if (body < len) fail(s"truncated frame body ($body of $len bytes)")
        nextFrame = frame
      }

      private def read(buf: Array[Byte]): Int = {
        var off = 0
        while (off < buf.length) {
          val n = is.read(buf, off, buf.length - off)
          if (n < 0) return off
          off += n
        }
        off
      }

      private def finish(): Unit = {
        done = true
        writer.join()
        val up = writerFailure.get()
        if (up != null)
          throw new IllegalStateException(
            s"input iterator failed while feeding worker ${command.mkString(" ")}", up)
        val code = proc.waitFor()
        if (code != 0) fail(s"worker exited with code $code")
      }

      private def fail(msg: String): Nothing = {
        done = true
        proc.destroyForcibly()
        val err = stderr.toString("UTF-8").trim
        throw new IllegalStateException(
          s"external worker ${command.mkString(" ")}: $msg" +
            (if (err.nonEmpty) s"; stderr: $err" else ""),
          writerFailure.get()) // root cause when the input side broke first
      }

      override def hasNext: Boolean = { fetch(); nextFrame != null }
      override def next(): Array[Byte] = {
        fetch()
        if (nextFrame == null) throw new NoSuchElementException("no more frames")
        val f = nextFrame; nextFrame = null; f
      }
    }
  }
}
