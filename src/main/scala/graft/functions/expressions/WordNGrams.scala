package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — a native Catalyst `Generator` (the UDTF
  * tier of the extension ladder: scalar Expression → Aggregate →
  * Generator → Rule → Strategy/Exec → DSv2 source): one input row
  * yields `(pos, gram)` rows for every n-word shingle of the
  * lowercased, whitespace-split text.
  *
  * Why a Generator when [[graft.operators.Dedup.shingleRows]] already
  * builds shingle rows from posexplode + a window `lead`: the window
  * form pays a per-document sort inside the window operator, while a
  * Generator emits shingles INSIDE the scan stage's Generate node —
  * no window state, no sort, embarrassingly row-local, which is the
  * right shape when shingles feed a hash-agg (MinHash, span dedup) at
  * 100 TB. Tokenization (trim → lower → split `\s+`) matches the
  * DuckDB oracle fragment (`string_split_regex(trim(lower(text)),
  * '\s+')`) token-for-token.
  *
  * `n` must be a foldable positive integer — enforced at analysis
  * time so a non-literal can't silently change arity mid-query.
  * Evaluation is interpreted ([[CodegenFallback]]), like most Spark
  * generators other than explode; the per-row cost is the split
  * itself, which any formulation pays.
  */
case class WordNGrams(child: Expression, nExpr: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) if nExpr.foldable =>
        val n = nExpr.eval(null)
        if (n != null && n.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("word_ngrams: n must be a positive literal")
      case (t, u) => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects (string, int literal), got (${t.simpleString}, ${u.simpleString})")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      // Locale.ROOT: default-locale toLowerCase diverges on e.g. tr_TR
      // JVMs ('I' → dotless 'ı'), breaking token parity with the
      // locale-independent `lower()` the rest of the tokenizer family
      // (TextFunctions.tokens) and the DuckDB oracle use.
      val toks = raw.asInstanceOf[UTF8String].toString
        .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Nil
      else (0 to toks.length - n).map { i =>
        InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNGrams =
    copy(child = newChildren(0), nExpr = newChildren(1))

  override def prettyName: String = "word_ngrams"
}
