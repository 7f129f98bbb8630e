package graft.sources.loki

import java.io.EOFException
import java.nio.ByteBuffer

import org.apache.parquet.io.{InputFile, SeekableInputStream}

/** parquet-java `InputFile` over an in-memory byte array — the Loki
  * query_range response is fully buffered before decode, mirroring the
  * reference (`src/scan.rs:195-198`: `resp.bytes().await` then
  * `ParquetRecordBatchStreamBuilder`). The memory ceiling is one HTTP
  * response per task; large ranges should be split via the `partitions`
  * option instead of growing this buffer.
  */
final class ByteArrayInputFile(bytes: Array[Byte]) extends InputFile {
  override def getLength: Long = bytes.length.toLong
  override def newStream(): SeekableInputStream = new SeekableInputStream {
    private var pos = 0

    override def getPos: Long = pos.toLong

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > bytes.length) {
        throw new EOFException(s"seek $newPos out of range [0, ${bytes.length}]")
      }
      pos = newPos.toInt
    }

    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos) & 0xff; pos += 1; b }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      // InputStream contract: a zero-length read returns 0 even at EOF
      // (-1 here would make a wrapping stream treat a zero-length poll
      // as end-of-stream and truncate the read)
      if (len == 0) return 0
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n)
      pos += n
      n
    }

    override def readFully(b: Array[Byte]): Unit = readFully(b, 0, b.length)

    override def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
      if (bytes.length - pos < len) throw new EOFException(s"need $len bytes at $pos")
      System.arraycopy(bytes, pos, b, off, len)
      pos += len
    }

    override def read(buf: ByteBuffer): Int = {
      if (buf.remaining() == 0) return 0 // see read(b, off, len)
      if (pos >= bytes.length) return -1
      val n = math.min(buf.remaining(), bytes.length - pos)
      buf.put(bytes, pos, n)
      pos += n
      n
    }

    override def readFully(buf: ByteBuffer): Unit = {
      val n = buf.remaining()
      if (bytes.length - pos < n) throw new EOFException(s"need $n bytes at $pos")
      buf.put(bytes, pos, n)
      pos += n
    }
  }
}
