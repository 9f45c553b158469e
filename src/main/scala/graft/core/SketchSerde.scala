package graft.core

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}

/** Serialization through the sketch's own compact wire format, for both
  * serializers Spark uses.
  *
  * Why this exists (measured, 1M-row bench): the default field-walking
  * serializers are the single biggest cost in the whole engine. An EBF
  * over 10^6 urls holds ~10^7 buckets as `Array[Array[Int]]`; Kryo and
  * Java serialization walk ~10^7 tiny objects per partial-aggregate
  * shuffle and per task closure, which made the global sketch build
  * anti-scale (local[32] slower than local[8]). Routing both paths
  * through `toBytes`/`loadBytes` (varint + bit-packed fingerprints)
  * shrinks the payload ~10x and removes the object churn entirely.
  *
  * - Kryo (`Encoders.kryo` aggregation buffers): [[KryoSerializable]] —
  *   Kryo instantiates via objenesis (no constructor) and calls `read`,
  *   so implementors keep header fields as vars and must fully
  *   initialize in [[loadBytes]].
  * - Java (task closures, broadcasts): `writeReplace` proxy pattern.
  */
trait BytesSerde extends KryoSerializable with Serializable {
  def toBytes: Array[Byte]

  /** Re-initialize this (possibly constructor-less) instance from the
    * wire format. */
  private[core] def loadBytes(bytes: Array[Byte]): Unit

  override def write(kryo: Kryo, output: Output): Unit = {
    val b = toBytes
    output.writeVarInt(b.length, true)
    output.writeBytes(b)
  }

  override def read(kryo: Kryo, input: Input): Unit = {
    val n = input.readVarInt(true)
    loadBytes(input.readBytes(n))
  }

  /** Java serialization proxy: ship wire bytes, rebuild on read. */
  protected def writeReplace(): AnyRef = new SerializedSketch(toBytes)
}

/** The Java-serialization proxy. Dispatches on the magic int. */
final class SerializedSketch(val bytes: Array[Byte]) extends Serializable {
  private def readResolve(): AnyRef = SketchSerde.fromBytes(bytes)
}

object SketchSerde {
  /** Deserialize any sketch by its magic header. */
  def fromBytes(bytes: Array[Byte]): AnyRef = {
    require(bytes.length >= 4, "truncated sketch")
    val magic = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    magic match {
      case Ebf.MAGIC     => Ebf.fromBytes(bytes)
      case Hll.MAGIC     => Hll.fromBytes(bytes)
      case Cms.MAGIC     => Cms.fromBytes(bytes)
      case Kll.MAGIC     => Kll.fromBytes(bytes)
      case TDigest.MAGIC => TDigest.fromBytes(bytes)
      case FreqSketch.MAGIC | FreqSketch.MagicV1 => FreqSketch.fromBytes(bytes)
      case Theta.MAGIC   => Theta.fromBytes(bytes)
      case BottomKSample.MAGIC => BottomKSample.fromBytes(bytes)
      case CountSketch.MAGIC => CountSketch.fromBytes(bytes)
      case DecayedCms.Magic  => DecayedCms.fromBytes(bytes)
      case m             => throw new IllegalArgumentException(f"unknown sketch magic 0x$m%08x")
    }
  }
}
