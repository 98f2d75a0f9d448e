package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the
  * greatest timestamp strictly before the left row's, per key —
  * the classic event-attribution / point-in-time-lookup operator
  * (absent from the reference, which has no joins at all; a
  * beyond-parity capability).
  *
  * Formulated as ONE window pass over the union of both sides, not a
  * join: a naive `left JOIN right ON key AND r.ts < l.ts` + argmax
  * explodes to O(|matches|) intermediate rows (quadratic per hot key
  * at 100 TB); the union-window form shuffles each input row exactly
  * once on the key and streams it in timestamp order. This is the
  * standard large-scale as-of pattern (one exchange + one sort).
  *
  * Tie rule: right rows at EXACTLY the left row's timestamp do not
  * match (strict <) — mirrored by DuckDB's `ASOF JOIN ... ON r.ts <
  * l.ts` oracle. Among right ties on ts, the carried VALUE is the
  * last-ordered one; emit the matched ts (deterministic) rather than
  * a tie-dependent payload when exact reproducibility matters.
  */
object AsOfJoin {

  /** @param left  probe side (rows to annotate)
    * @param right reference side (rows to look up)
    * @param keyCols equality key column names (both sides)
    * @param tsCol  event-time column name (both sides)
    * @param valueCols right-side columns to carry (emitted as
    *                  `asof_<name>`, null when no prior right row)
    * @param direction "backward" (default): greatest right ts
    *                  strictly BEFORE the left row's; "forward": the
    *                  smallest right ts strictly AFTER it (pandas
    *                  merge_asof directions).
    * @param toleranceUs max lookback (look-ahead when forward) in µs,
    *                    pandas merge_asof semantics: a matched row
    *                    farther than the tolerance does NOT match —
    *                    the row is kept with null asof columns.
    *                    None = unbounded.
    * @param toleranceCol name of a LEFT µs-long column carrying a
    *                     PER-ROW tolerance (the irregular-sensor
    *                     shape: each key reports at its own cadence,
    *                     so one global bound either starves slow keys
    *                     or admits stale matches on fast ones).
    *                     Mutually exclusive with `toleranceUs`; a null
    *                     tolerance value matches nothing for that row.
    * @return left rows + matched right ts (`asof_ts`) + carried values */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, valueCols: Seq[String],
           toleranceUs: Option[Long] = None,
           direction: String = "backward",
           toleranceCol: Option[String] = None): DataFrame = {
    require(toleranceUs.forall(_ > 0), "tolerance must be positive")
    require(toleranceUs.isEmpty || toleranceCol.isEmpty,
      "toleranceUs and toleranceCol are mutually exclusive")
    require(toleranceCol.forall(left.columns.contains),
      s"toleranceCol $toleranceCol is not a left column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    // loud failure instead of silent clobbering: "__"-prefixed names
    // are internal here, and asof_* are the outputs
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "input uses reserved __-prefixed column names")
    val outNames = "asof_ts" +: valueCols.map(c => s"asof_$c")
    require(!outNames.exists(left.columns.contains),
      s"output columns $outNames collide with a left column")
    val leftCols = left.columns
    // tag and align schemas: left rows sort BEFORE right rows at equal
    // ts (side 0 vs 1), so a same-ts right row lands outside the
    // [unbounded, -1] frame — strict `<` semantics
    val lTagged = left
      .withColumn("__side", lit(0))
      .withColumn("__asof_ts", lit(null).cast("timestamp"))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), col("__side"),
        col("__asof_ts")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol).map(col): _*)
    val rTagged = right
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col(tsCol).as("__ts"), col("__side"),
        col(tsCol).as("__asof_ts")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // ONE carried payload per right row: a single last(ignoreNulls)
    // window picks the matched right row whole, so asof_ts and every
    // asof_<c> come from THAT row (independent per-column last()
    // windows would pull a null value column from an older right row —
    // possibly outside tolerance — mixing fields across rows). The
    // ORDERABLE payload fields also join the ordering as a final
    // tiebreak so right rows tied on ts yield a deterministic payload
    // instead of shuffle-order roulette — map-typed value columns are
    // carried but excluded from the sort key (maps aren't orderable
    // and would fail analysis; ties identical on every orderable field
    // may then carry either map — documented residual nondeterminism).
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val payload = when(col("__side") === 1,
      struct(col("__asof_ts").as("__pts") +:
        valueCols.map(c => col(s"__v_$c").as(c)): _*))
    val tieBreak = when(col("__side") === 1,
      struct(col("__asof_ts").as("__pts") +:
        valueCols.filter(c => orderable(right.schema(c).dataType))
          .map(c => col(s"__v_$c").as(c)): _*))
    // forward = the same one-exchange union-window machinery run in
    // REVERSE time order: rows "before" the current one in the frame
    // are those with strictly LATER ts, so last(ignoreNulls) picks the
    // nearest following right row. Left rows still order before right
    // rows at equal ts (side asc), preserving strict inequality.
    val tsOrd = if (fwd) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("__side"), tieBreak)
      .rowsBetween(Window.unboundedPreceding, -1)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(payload, ignoreNulls = true).over(w))
    // tolerance is a post-filter on the matched timestamp, not a window
    // change: the nearest prior row either qualifies or nothing does
    // (any earlier row is older still), so null-ing is exact. The
    // per-row variant reads the left row's own tolerance column —
    // available right here because left payload columns ride the
    // side-0 rows through the union window.
    val tolExpr: Option[Column] =
      toleranceCol.map(col).orElse(toleranceUs.map(t => lit(t)))
    val bounded = tolExpr match {
      case None => matched
      case Some(tol) =>
        val gap =
          if (fwd) unix_micros(col("__m.__pts")) - unix_micros(col("__ts"))
          else unix_micros(col("__ts")) - unix_micros(col("__m.__pts"))
        val ok = col("__m").isNotNull && gap <= tol
        matched.withColumn("__m", when(ok, col("__m")))
    }
    bounded.filter(col("__side") === 0)
      .select(keyCols.map(col) ++ Seq(col("__ts").as(tsCol),
        col("__m.__pts").as("asof_ts")) ++
        valueCols.map(c => col(s"__m.$c").as(s"asof_$c")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol).map(col): _*)
  }

  /** Nearest-direction as-of (pandas merge_asof `direction="nearest"`):
    * per left row, the CLOSER of the nearest strictly-prior and
    * nearest strictly-later right rows; exact ties prefer backward
    * (pandas semantics). Adds `asof_dir` ("backward"/"forward", null
    * when nothing matched within tolerance).
    *
    * Built as the backward and forward passes joined on `idCol` — a
    * UNIQUE left-row key the caller must provide (real event streams
    * have one; joining on it keeps the combine exact instead of
    * guessing row identity from payload columns). Cost: each pass is
    * the one-exchange union-window, plus one |left|-sized equi-join
    * to combine — still nothing pair-shaped. */
  def asofNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  tsCol: String, idCol: String, valueCols: Seq[String],
                  toleranceUs: Option[Long] = None,
                  toleranceCol: Option[String] = None): DataFrame = {
    require(left.columns.contains(idCol), s"left is missing idCol $idCol")
    val back = asof(left, right, keyCols, tsCol, valueCols, toleranceUs,
      "backward", toleranceCol)
    val fwd = asof(left, right, keyCols, tsCol, valueCols, toleranceUs,
      "forward", toleranceCol)
    val bRen = ("asof_ts" +: valueCols.map(c => s"asof_$c"))
      .foldLeft(back)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val fSel = fwd.select(col(idCol) +:
      ("asof_ts" +: valueCols.map(c => s"asof_$c"))
        .map(c => col(c).as(s"__f_$c")): _*)
    val j = bRen.join(fSel, Seq(idCol))
    val bT = col("__b_asof_ts"); val fT = col("__f_asof_ts")
    val useBack = bT.isNotNull && (fT.isNull ||
      unix_micros(col(tsCol)) - unix_micros(bT) <=
        unix_micros(fT) - unix_micros(col(tsCol)))
    val outCols =
      j.columns.filterNot(_.startsWith("__")).map(col) ++
        Seq(when(useBack, bT).otherwise(fT).as("asof_ts"),
          when(bT.isNull && fT.isNull, lit(null).cast("string"))
            .when(useBack, lit("backward")).otherwise(lit("forward"))
            .as("asof_dir")) ++
        valueCols.map(c => when(useBack, col(s"__b_asof_$c"))
          .otherwise(col(s"__f_asof_$c")).as(s"asof_$c"))
    j.select(outCols.toIndexedSeq: _*)
  }
}
