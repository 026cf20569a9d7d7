package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over a pre-hashed shingle array.
  *
  * The composed form
  * `aggregate(hashes, array_repeat(MaxValue, 64), zip_with(acc, seq, least(m, xxhash64(h, j))))`
  * allocates one fresh 64-element array per shingle per document and
  * re-hashes the 8-byte shingle value inside every one of the 64
  * xxhash64(h, j) calls. This expression is the fused kernel: one
  * mutable 64-long signature buffer per document, and the shingle's
  * own hash round computed ONCE and reused as the seed of the 64
  * per-slot finalizations — exactly the chaining Spark's two-argument
  * xxhash64 performs (fold left from seed 42: first the long, then
  * the int slot index), so signatures are bit-identical to the
  * composed form. DedupSpec asserts that equivalence on the fixture
  * corpus; the dedup_minhash oracles (estimator-error bounds vs exact
  * Jaccard recomputed in DuckDB) are unchanged.
  *
  * Scale note: signature computation is the per-document CPU hot loop
  * of MinHash dedup at 100 TB (64 x n_shingles hashes per doc). The
  * kernel halves the hash work and removes O(n_shingles) short-lived
  * arrays per document from the young-gen path. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashKernel.compute($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashKernel {
  /** The signature width every consumer assumes: Dedup's band slicing
    * (16 bands x 4 rows) and the `graft_minhash` registration both
    * derive from this one constant. */
  val DefaultNumHashes = 64

  /** sig[j] = min over shingle hashes h of xxhash64(h, j), with
    * xxhash64's fold (seed 42 → hashLong(h) → hashInt(j)) split so the
    * long round runs once per shingle, not once per (shingle, slot).
    * Calls the XXH64 primitive statics directly — going through
    * XxHash64Function.hash would re-do a DataType match and box the
    * shingle long on every call of the hot loop. */
  def compute(hashes: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      // a null element cannot occur (xxhash64 of a non-null string);
      // skip defensively rather than NPE if one ever does
      if (!hashes.isNullAt(i)) {
        val inner = XXH64.hashLong(hashes.getLong(i), 42L)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashInt(j, inner)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
