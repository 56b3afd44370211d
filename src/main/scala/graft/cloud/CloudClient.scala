package graft.cloud

import scala.collection.concurrent.TrieMap

/**
 * Organization-scoped cloud client object model (reference
 * `airbyte/cloud/client.py` + `organizations.py`): organizations own
 * workspaces; workspace listings filter by name server-side; billing
 * status rolls up to an account-lock flag. Same transport story as
 * [[CloudWorkspace]]: the API surface is a trait, the zero-egress impl
 * is backing state in-process (the reference's HTTP `api_util` calls
 * are the part a sandboxed engine legitimately does not reproduce —
 * auth/credential flows stay out of scope with them).
 */
final case class OrganizationInfo(
    organizationId: String,
    organizationName: String,
    email: Option[String] = None,
    /** Billing fields (reference `payment_status`/`subscription_status`,
      * `organizations.py:102-114`). */
    paymentStatus: Option[String] = None,
    subscriptionStatus: Option[String] = None) {

  /** `is_account_locked` (reference `api_util.is_account_locked`,
    * LOCKED_PAYMENT_STATUSES at api_util.py:2704): payment status
    * "disabled" OR "locked", or an unsubscribed org, locks the account. */
  def isAccountLocked: Boolean =
    paymentStatus.exists(s =>
      OrganizationInfo.LockedPaymentStatuses(s.toLowerCase(java.util.Locale.ROOT))) ||
      subscriptionStatus.exists(_.equalsIgnoreCase("unsubscribed"))
}

object OrganizationInfo {
  /** Reference `LOCKED_PAYMENT_STATUSES` (api_util.py:2704). */
  val LockedPaymentStatuses: Set[String] = Set("disabled", "locked")
}

final case class WorkspaceInfo(
    workspaceId: String, workspaceName: String, organizationId: String)

/** Client API: the reference `CloudClient` surface that is object-model
  * (not HTTP-auth) shaped. */
trait CloudClient {
  def listOrganizations(nameContains: Option[String] = None): Seq[OrganizationInfo]
  def getOrganization(organizationId: String): OrganizationInfo
  /** `list_workspaces` (client.py:227-245): organization REQUIRED —
    * the reference refuses to list across all organizations. */
  def listWorkspaces(
      organizationId: String,
      nameContains: Option[String] = None,
      limit: Option[Int] = None): Seq[WorkspaceInfo]
  def getWorkspace(workspaceId: String): CloudWorkspace
}

/** In-process client: organizations and workspaces registered locally;
  * every workspace handle is engine-backed ([[LocalWorkspaceApi]]). */
final class LocalCloudClient(spark: org.apache.spark.sql.SparkSession)
    extends CloudClient {
  private val orgs = TrieMap.empty[String, OrganizationInfo]
  private val workspaces = TrieMap.empty[String, (WorkspaceInfo, CloudWorkspace)]

  def registerOrganization(info: OrganizationInfo): Unit = {
    orgs.put(info.organizationId, info); ()
  }

  def registerWorkspace(workspaceId: String, name: String,
      organizationId: String): CloudWorkspace = {
    require(orgs.contains(organizationId), s"unknown organization '$organizationId'")
    val ws = new CloudWorkspace(workspaceId, new LocalWorkspaceApi(spark))
    workspaces.put(workspaceId,
      (WorkspaceInfo(workspaceId, name, organizationId), ws))
    ws
  }

  override def listOrganizations(nameContains: Option[String]): Seq[OrganizationInfo] =
    orgs.values.toSeq
      .filter(o => nameContains.forall(n =>
        o.organizationName.toLowerCase(java.util.Locale.ROOT)
          .contains(n.toLowerCase(java.util.Locale.ROOT))))
      .sortBy(_.organizationId)

  override def getOrganization(organizationId: String): OrganizationInfo =
    orgs.getOrElse(organizationId,
      throw new NoSuchElementException(s"unknown organization '$organizationId'"))

  override def listWorkspaces(organizationId: String,
      nameContains: Option[String], limit: Option[Int]): Seq[WorkspaceInfo] = {
    require(organizationId.nonEmpty, "Organization ID is required.")
    val all = workspaces.values.toSeq.map(_._1)
      .filter(_.organizationId == organizationId)
      .filter(w => nameContains.forall(n =>
        w.workspaceName.toLowerCase(java.util.Locale.ROOT)
          .contains(n.toLowerCase(java.util.Locale.ROOT))))
      .sortBy(_.workspaceId)
    limit.fold(all)(all.take)
  }

  override def getWorkspace(workspaceId: String): CloudWorkspace =
    workspaces.getOrElse(workspaceId,
      throw new NoSuchElementException(s"unknown workspace '$workspaceId'"))._2
}
