package graft.store

import java.nio.ByteBuffer

/**
 * Byte codecs for the vector-serving domains — plain JVM, NO Spark on
 * the classpath (the serving side shares them with [[AnnReader]]).
 * Doubles pack big-endian, 8 bytes each, in element order; keys use the
 * same big-endian encodings as `graft.functions.long_be`/`int_be`, so a
 * domain built by the engine and a reader built from this file agree
 * byte-for-byte.
 */
object VectorCodec {

  def pack(v: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * v.length)
    var i = 0
    while (i < v.length) { bb.putDouble(v(i)); i += 1 }
    bb.array()
  }

  def unpack(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length % 8 == 0, s"vector blob length ${bytes.length} not a multiple of 8")
    val bb = ByteBuffer.wrap(bytes)
    val v = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < v.length) { v(i) = bb.getDouble(); i += 1 }
    v
  }

  def longBe(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()

  def intBe(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
}
