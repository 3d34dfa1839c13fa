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

  /** AWS account-id → friendly-name translation (ref IdentityManager
    * `aws_account_map`, applied to the cloudtrail acted-on object at
    * parse time in the reference, Cloudtrail.java:105-109). The map is
    * tiny config, so it rides as a literal map expression — pure
    * codegen'd projection, no join; unmapped ids pass through. */
  def mapAwsAccount(obj: Column, accountMap: Map[String, String]): Column =
    if (accountMap.isEmpty) obj
    else coalesce(element_at(typedLit(accountMap), obj), obj)
}
