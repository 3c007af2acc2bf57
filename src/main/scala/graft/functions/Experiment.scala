package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation-platform kernels: deterministic A/B assignment and
  * CUPED variance reduction — the two primitives an analytics engine
  * runs on every experiment readout. Both follow the repo's
  * determinism doctrine: assignment is a pure salted-md5 bucket (same
  * user → same variant on any engine, any rerun, any partitioning —
  * unlike rand(seed), whose draw depends on the physical split), and
  * the CUPED moments accumulate as exact integers so θ and the
  * adjusted means close with a FIXED sequence of IEEE operations.
  */
object Experiment {

  /** Deterministic variant assignment: the unit lands in `control` iff
    * the leading hex digits of md5(salt ":" unit) sort below
    * `controlHexCut` — a 50/50 split at cut "8", and any m/16ⁿ split by
    * widening the cut string (e.g. "c" → 75/25, "0d" → ~5% control).
    * Salting by experiment name keeps assignments independent across
    * concurrent experiments on the same population. Pure expression —
    * no shuffle, no state, reproducible cross-engine (md5 of identical
    * bytes, lexicographic compare on lowercase hex both sides).
    */
  def assignVariant(unit: Column, salt: String,
      controlHexCut: String = "8"): Column =
    when(substring(md5(concat(lit(salt + ":"), unit.cast("string"))),
        1, controlHexCut.length) < controlHexCut,
      lit("control")).otherwise(lit("treatment"))

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) adjusted
    * means per variant: ŷᵥ = ȳᵥ − θ·(x̄ᵥ − x̄), θ = cov(x,y)/var(x)
    * pooled over ALL units — the industry-standard variance-reduction
    * readout (Deng et al., WSDM 2013). `perUser` carries one row per
    * unit with integer-exact pre-period covariate `xCol` and
    * post-period metric `yCol` (cents — the repo convention): the four
    * moments Σx, Σy, Σxy, Σx² accumulate as exact decimals in ONE
    * hash-agg, θ = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) closes with one IEEE
    * division ROUNDED AT 6 BEFORE use (so both engines adjust with the
    * same θ), and each variant's adjusted mean is three exact-integer
    * divisions composed in a fixed order, rounded at 6. The 1-row θ
    * frame rides a broadcast — per-variant work never re-shuffles.
    */
  def cuped(perUser: DataFrame, variantCol: String, xCol: String,
      yCol: String): DataFrame = {
    val a = perUser.select(col(variantCol).as("variant"),
      col(xCol).cast("decimal(38,0)").as("__x"),
      col(yCol).cast("decimal(38,0)").as("__y"))
    val th = a.agg(
        count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n"), col("__sx"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"),
          6).as("theta"))
    a.groupBy(col("variant"))
      .agg(count(lit(1)).as("__nv"),
        sum(col("__x")).as("__sxv"),
        sum(col("__y")).as("__syv"))
      .crossJoin(broadcast(th))
      .select(col("variant"),
        col("__nv").cast("long").as("n_users"),
        col("theta"),
        round(col("__syv").cast("double") / col("__nv").cast("double"),
          6).as("raw_mean"),
        round(col("__syv").cast("double") / col("__nv").cast("double") -
          col("theta") * (col("__sxv").cast("double") / col("__nv").cast("double") -
            col("__sx").cast("double") / col("__n").cast("double")),
          6).as("cuped_mean"))
  }

  /** Welch's unequal-variance two-sample t readout over one-row-per-
    * unit data: t = (ȳₜ − ȳ꜀)/√(s²꜀/n꜀ + s²ₜ/nₜ) with Welch–
    * Satterthwaite degrees of freedom — the significance line under
    * [[cuped]]'s point estimates. Deterministic cross-engine WITHOUT
    * any closing-division restriction: the six moments (n, Σy, Σy²
    * per arm) accumulate as exact integers in ONE conditional
    * hash-agg (no join — the arm indicator multiplies into each sum),
    * and everything after is division/multiplication/sqrt only — all
    * correctly-rounded IEEE operations, so the chain is bit-identical
    * on any engine; only double SUMS (accumulation order) are banned
    * by the doctrine, and there are none here. `variantCol` must hold
    * the [[assignVariant]] labels; output rounds at 6.
    */
  def welchT(perUser: DataFrame, variantCol: String, yCol: String): DataFrame = {
    val ctl = when(col(variantCol) === "control", lit(1)).otherwise(lit(0))
      .cast("decimal(38,0)")
    val m = perUser.select(ctl.as("__ctl"),
        col(yCol).cast("decimal(38,0)").as("__y"))
      .agg(sum(col("__ctl")).as("__nc"),
        sum(lit(1) - col("__ctl")).as("__nt"),
        sum(col("__y") * col("__ctl")).as("__sc"),
        sum(col("__y") * (lit(1) - col("__ctl"))).as("__st"),
        sum(col("__y") * col("__y") * col("__ctl")).as("__qc"),
        sum(col("__y") * col("__y") * (lit(1) - col("__ctl"))).as("__qt"))
    val s = m.select(col("__nc"), col("__nt"),
      (col("__sc").cast("double") / col("__nc").cast("double")).as("__mc"),
      (col("__st").cast("double") / col("__nt").cast("double")).as("__mt"),
      ((col("__nc") * col("__qc") - col("__sc") * col("__sc")).cast("double") /
        (col("__nc") * (col("__nc") - 1)).cast("double")).as("__vc"),
      ((col("__nt") * col("__qt") - col("__st") * col("__st")).cast("double") /
        (col("__nt") * (col("__nt") - 1)).cast("double")).as("__vt"))
    val f = s.select(col("__nc"), col("__nt"), col("__mc"), col("__mt"),
      (col("__vc") / col("__nc").cast("double")).as("__ac"),
      (col("__vt") / col("__nt").cast("double")).as("__at"))
    f.select(col("__nc").cast("long").as("n_control"),
      col("__nt").cast("long").as("n_treatment"),
      round(col("__mc"), 6).as("mean_control"),
      round(col("__mt"), 6).as("mean_treatment"),
      round(col("__mt") - col("__mc"), 6).as("diff"),
      round((col("__mt") - col("__mc")) / sqrt(col("__ac") + col("__at")),
        6).as("t_stat"),
      round((col("__ac") + col("__at")) * (col("__ac") + col("__at")) /
        (col("__ac") * col("__ac") / (col("__nc") - 1).cast("double") +
         col("__at") * col("__at") / (col("__nt") - 1).cast("double")),
        6).as("df"))
  }
}
