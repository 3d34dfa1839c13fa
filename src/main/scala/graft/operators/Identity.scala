package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Identity resolution (ref s/identity/IdentityManager.java +
  * AuthProfile ExtractIdentity, s/authprofile/AuthProfile.java:
  * 254-307): map a username/alias to its canonical identity via a
  * small alias table; unresolved users keep their own name.
  *
  * Spark-first: a broadcast left join + coalesce — the alias table is
  * tiny by construction (config-derived in the reference), so the
  * join is map-side with zero shuffle of the event stream.
  */
object Identity {

  /** aliasDf must have columns (alias, canonical). */
  def resolve(df: DataFrame, user: Column, aliasDf: DataFrame): DataFrame =
    df.withColumn("_user", user)
      .join(broadcast(aliasDf), col("_user") === col("alias"), "left")
      .withColumn("identity", coalesce(col("canonical"), col("_user")))
      .drop("alias", "canonical", "_user")
}
