package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types._

/** Per-group fold buffer: user_id → (2 flag bits | message count),
  * plus a slot for a null user (kept out of the distinct-user counts,
  * exactly like COUNT(DISTINCT)'s null skipping, but still eligible
  * for the flagged-message sum — mirroring the two-level form's
  * null-user group). */
final class UserFoldBuf(var nullBits: Int, var nullMsgs: Long,
                        val m: mutable.LongMap[Long])

/** Single-exchange replacement for the two-level "per (instance,
  * user) flags, then per instance" aggregation family (q15
  * author-filter, q56 heuristic-profile). The two-level form pays two
  * shuffle barriers; the per-user level only exists to (a) count
  * DISTINCT users (optionally restricted to a flag) and (b) sum one
  * per-user count over flagged users — state that is BOUNDED by the
  * participants of one instance (~6 in this corpus, never more than
  * the instance's user population), so it folds into ONE aggregation
  * whose partial state rides the single exchange as a tiny map.
  *
  * Inputs per event row: `user` (bigint, the distinct key), `bits`
  * (int, which flags this event raises on its user: bit 1 / bit 2 —
  * callers assign meanings, e.g. q15 uses 1 = DM-marker event,
  * 2 = author-marker event), `isMsg` (boolean — count this event into
  * the user's message tally). Output struct, all bigint:
  *   n_users        distinct non-null users
  *   n_flag1        users holding bit 1
  *   n_flag2        users holding bit 2
  *   msgs_flagged   Σ msgs over users holding ANY bit (null user
  *                  included — a flagged null group's messages count,
  *                  as in the two-level form)
  *
  * Spark shape: a [[TypedImperativeAggregate]] — partial aggregation
  * still runs map-side (the exchange moves one small map per
  * (mapper, instance), not events), merge is bit-OR + count-add, and
  * the sort-based fallback works through [[serialize]] like any
  * object aggregate. The trade the A/B in BENCH_SF10.md weighs: the
  * enclosing hash aggregate becomes ObjectHashAggregate (no
  * whole-stage codegen for the scan-side partial) in exchange for one
  * less exchange barrier and no second aggregation stage.
  */
case class UserFlagFold(user: Expression, bits: Expression, isMsg: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UserFoldBuf] {

  private val MsgMask = (1L << 62) - 1

  // ExpectsInputTypes is not implementable out-of-tree (AbstractDataType
  // is private[sql]); explicit type check instead — the QuantizedDotProduct
  // precedent.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (user.dataType == LongType && bits.dataType == IntegerType &&
      isMsg.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, int, boolean) inputs, got " +
        s"(${user.dataType.catalogString}, ${bits.dataType.catalogString}, " +
        s"${isMsg.dataType.catalogString})")
  }
  override def children: Seq[Expression] = Seq(user, bits, isMsg)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_users", LongType, nullable = false),
    StructField("n_flag1", LongType, nullable = false),
    StructField("n_flag2", LongType, nullable = false),
    StructField("msgs_flagged", LongType, nullable = false)))
  override def prettyName: String = "user_flag_fold"

  override def createAggregationBuffer(): UserFoldBuf =
    new UserFoldBuf(0, 0L, mutable.LongMap.empty[Long])

  override def update(buf: UserFoldBuf, input: InternalRow): UserFoldBuf = {
    val bRaw = bits.eval(input)
    val bi = if (bRaw == null) 0 else bRaw.asInstanceOf[Int] & 3
    val mRaw = isMsg.eval(input)
    val mi = if (mRaw != null && mRaw.asInstanceOf[Boolean]) 1L else 0L
    val u = user.eval(input)
    if (u == null) {
      buf.nullBits |= bi
      buf.nullMsgs += mi
    } else {
      val k = u.asInstanceOf[Long]
      val cur = buf.m.getOrElse(k, 0L)
      buf.m.update(k, (((cur >>> 62) | bi) << 62) | ((cur & MsgMask) + mi))
    }
    buf
  }

  override def merge(buf: UserFoldBuf, other: UserFoldBuf): UserFoldBuf = {
    buf.nullBits |= other.nullBits
    buf.nullMsgs += other.nullMsgs
    other.m.foreach { case (k, v) =>
      val cur = buf.m.getOrElse(k, 0L)
      buf.m.update(k,
        (((cur >>> 62) | (v >>> 62)) << 62) | ((cur & MsgMask) + (v & MsgMask)))
    }
    buf
  }

  override def eval(buf: UserFoldBuf): Any = {
    var f1 = 0L
    var f2 = 0L
    var kept = if (buf.nullBits != 0) buf.nullMsgs else 0L
    buf.m.foreach { case (_, v) =>
      val b = (v >>> 62).toInt
      if ((b & 1) != 0) f1 += 1
      if ((b & 2) != 0) f2 += 1
      if (b != 0) kept += v & MsgMask
    }
    new GenericInternalRow(Array[Any](buf.m.size.toLong, f1, f2, kept))
  }

  override def serialize(buf: UserFoldBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 16 * buf.m.size)
    bb.putInt(buf.nullBits)
    bb.putLong(buf.nullMsgs)
    bb.putInt(buf.m.size)
    buf.m.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): UserFoldBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val nullBits = bb.getInt
    val nullMsgs = bb.getLong
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) {
      m.update(bb.getLong, bb.getLong)
      i += 1
    }
    new UserFoldBuf(nullBits, nullMsgs, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UserFlagFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UserFlagFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UserFlagFold =
    copy(user = newChildren(0), bits = newChildren(1), isMsg = newChildren(2))
}

object UserFlagFold {
  /** Column-level entry: `agg(UserFlagFold.fold(u, b, m).as("f"))`,
    * then read `f.n_users` / `f.n_flag1` / `f.n_flag2` /
    * `f.msgs_flagged`. */
  def fold(user: Column, bits: Column, isMsg: Column): Column =
    SparkSqlBridge.column(UserFlagFold(
      SparkSqlBridge.expression(user),
      SparkSqlBridge.expression(bits),
      SparkSqlBridge.expression(isMsg)).toAggregateExpression())
}
