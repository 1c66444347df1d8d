package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The statistical-test harness over event measures — drift (PSI, exact
  * and binned KS), rank tests (Mann-Whitney, exact and binned), CUSUM
  * change detection, robust outliers (MAD), concentration (Gini),
  * first-digit conformance (Benford), survival (Kaplan-Meier), A/B
  * z-tests and the deterministic Poisson-bootstrap CI. Split out of
  * EventOps (round 8) purely for file hygiene - same operators, same
  * specs (StatOpsSpec, SketchBinnedSpec, crosscheck_stats.py).
  *
  * Scale shape: every test reduces the raw stream with ONE map-side
  * combinable aggregate (per distinct value, per bin, per unit, or per
  * replicate) before any window; the continuous-measure scale paths are
  * the binned variants whose support is bins-sized by construction. */
object StatOps extends StatDistOps with StatSeriesOps

