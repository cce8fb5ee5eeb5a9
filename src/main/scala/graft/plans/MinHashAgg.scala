package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature aggregate — the custom
  * AGGREGATE-function extension path (TypedImperativeAggregate),
  * complementing the scalar-expression (DotProduct), optimizer-rule
  * (RewriteSelfDot) and whole-operator (TopKPerKeyExec) extension
  * paths already in `plans/`.
  *
  * Semantics are EXACTLY operators/Dedup.minhashSigs' 16-column
  * min-agg spelling (two md5 digests per shingle — "0|s" and "1|s" —
  * sliced into 16 4-hex-char minima): `graft_minhash(s)` ==
  * `array(min(substr(md5('0|'||s),1,4)), ...)`. The win at scale is
  * state shape, not hashing cost: ONE buffer of 16 short strings per
  * group flows through the map-side combine instead of 16 independent
  * agg columns, and the hash slices never materialize as row columns.
  * Spec-proved equal to the declarative spelling (EngineSpec).
  */
case class MinHashSig(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  private val K = 16

  // one digest per task, not per row — getInstance does provider
  // lookup + allocation; transient so the expression stays serializable
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[String] = Array.fill[String](K)(null)

  private def hex(s: String): String =
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val d0 = hex("0|" + s)
      val d1 = hex("1|" + s)
      var i = 0
      while (i < K) {
        val slice = (if (i < 8) d0 else d1).substring((i % 8) * 4, (i % 8) * 4 + 4)
        if (buf(i) == null || slice < buf(i)) buf(i) = slice
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < K) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  // 16 fixed-width 4-hex slices (or "-" for a never-updated slot) —
  // a csv is an unambiguous wire format here.
  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(s => if (s == null) "-" else s).mkString(",").getBytes("UTF-8")

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, "UTF-8").split(",", -1).map(s => if (s == "-") null else s)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
