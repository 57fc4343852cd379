package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** Iceberg's `bucket(N, col)` partition transform for integral keys —
  * the device that makes storage-partitioned joins work on
  * HIGH-CARDINALITY keys: identity partitioning (o16) lands one file
  * per key (fine for 8 tenants, absurd for 10⁹ user ids), while bucket
  * partitioning hashes the key into N stable buckets, so the file count
  * is bounded by N and two tables bucketed `bucket(N, k)` still co-align
  * group-for-group (the join shuffle is paid once at write time).
  *
  * The hash is the Iceberg spec's (reference behavior: Iceberg bucket
  * transform): `(murmur3_x86_32(littleEndianBytes(v), seed = 0) &
  * Integer.MAX_VALUE) % N`. Spark's `Murmur3_x86_32.hashLong(v, 0)`
  * consumes the long as two little-endian 4-byte blocks — byte-identical
  * to hashing the 8-byte little-endian buffer, i.e. exactly the spec's
  * long hash; ints widen to long first (Iceberg: `bucket(int) ==
  * bucket((long) int)`), so a reader who buckets with Iceberg's
  * published transform lands on the same ids.
  *
  * Three faces of ONE function, all delegating to [[bucketId]]:
  *  - the raw scala method (the [[CommitDataWriter]] computes each
  *    row's recorded partition key with it);
  *  - a catalyst [[BucketIdExpr]] (codegen'd) for write-side shuffles
  *    that must pre-shape without the V2 distribution contract
  *    (maintenance rewrites: compact and the partitioned clustering
  *    rewrite on a bucket layout);
  *  - the DSv2 [[unbound]] function ([[CommitCatalog]] exposes it as a
  *    `FunctionCatalog` entry named `bucket`), which is what lets Spark
  *    resolve `PARTITIONED BY (bucket(8, user_id))`, plan the INSERT's
  *    clustered distribution, and — on the read side — translate the
  *    scan's `KeyGroupedPartitioning(bucket(8, user_id))` into the
  *    `TransformExpression` the storage-partitioned join aligns on
  *    (SPARK-37377; the same wiring Iceberg's Spark integration uses).
  */
object BucketFunction {

  /** The Iceberg bucket id of an integral key. */
  def bucketId(numBuckets: Int, v: Long): Int =
    ((org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 0)
      & Integer.MAX_VALUE) % numBuckets)

  /** Column form over a catalyst expression (maintenance pre-shaping). */
  def bucketCol(numBuckets: Int, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bucket_id",
      { args =>
        require(args.length == 2, "graft_bucket_id(numBuckets, key)")
        val n = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => sys.error(s"graft_bucket_id: numBuckets must be an int literal, got $other")
        }
        BucketIdExpr(n, args(1))
      },
      "built-in")
    org.apache.spark.sql.functions.call_function("graft_bucket_id",
      org.apache.spark.sql.functions.lit(numBuckets), c)
  }

  /** The DSv2 function [[CommitCatalog]] serves as `bucket`. */
  val unbound: UnboundFunction = new UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): Iceberg bucket transform (murmur3 of the " +
        "integral key, seed 0, masked to non-negative, mod numBuckets)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"graft-commit: bucket takes (numBuckets, key), got ${inputType.length} args")
      require(inputType(0).dataType == IntegerType,
        s"graft-commit: bucket's numBuckets must be INT, got ${inputType(0).dataType.simpleString}")
      val keyType = inputType(1).dataType
      require(keyType == LongType || keyType == IntegerType,
        s"graft-commit: bucket keys must be BIGINT or INT, got ${keyType.simpleString} " +
          "(the identity-partition key rule, applied to the bucket source)")
      new BucketBound(keyType)
    }
  }

  private class BucketBound(keyType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    /** SPJ compares TransformExpressions by canonical name — one stable
      * identity, shared by every catalog instance, makes two bucketed
      * scans compatible. */
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = if (keyType == LongType) input.getLong(1) else input.getInt(1).toLong
      bucketId(n, v)
    }
  }
}

/** Codegen'd catalyst form of [[BucketFunction.bucketId]] — used only in
  * maintenance rewrites' pre-shaping shuffles (never a hot read path). */
case class BucketIdExpr(numBuckets: Int, child: Expression)
    extends UnaryExpression {
  require(numBuckets >= 1, s"bucket(n, col) needs n >= 1, got $numBuckets")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_id expects a BIGINT or INT key, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bucket_id"
  override protected def nullSafeEval(input: Any): Any = input match {
    case l: Long => BucketFunction.bucketId(numBuckets, l)
    case i: Int  => BucketFunction.bucketId(numBuckets, i.toLong)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sources.BucketFunction.bucketId($numBuckets, (long)($c))")
  override protected def withNewChildInternal(newChild: Expression): BucketIdExpr =
    copy(child = newChild)
}
