package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structural QC for chat/SFT conversations — the validation pass an
  * instruction-tuning pipeline runs before tokenize-and-mask: a
  * malformed dialog (role out of place, empty turn, copy-paste loop)
  * poisons the loss mask silently, because the masking code trusts
  * the role sequence.
  *
  * A conversation is an `array<struct<role:string, content:string>>`
  * column. The contract checked by [[dialogFlags]]:
  *
  *  - an optional single leading `system` turn;
  *  - the remaining turns (the "body") use only `user`/`assistant`
  *    roles, strictly alternating, starting at `user` and ending at
  *    `assistant` with at least one exchange (body ≥ 2 turns);
  *  - no turn anywhere (system included) is empty after trim;
  *  - no two consecutive turns repeat the same non-empty content
  *    (degenerate self-loops survive role alternation checks).
  *
  * Everything is row-local over the array column (transform / slice /
  * zip_with / aggregate) — no explode, no shuffle, no UDF; a corpus
  * scan emits the flags in the same stage that read the rows, so the
  * gate costs one pass at any corpus size.
  */
object Dialog {

  /** Per-conversation validation flags (see object doc for the
    * contract). Null-robust: a null array yields n_turns 0 and
    * valid = false; a null role or content fails the affected checks
    * rather than erroring (get/coalesce discipline — ANSI-safe).
    *
    * @return struct(n_turns int, has_system, starts_user,
    *         ends_assistant, roles_ok, alternates, has_empty,
    *         dup_turn, user_chars int, assistant_chars int, valid).
    */
  def dialogFlags(
      turns: Column,
      userRole: String = "user",
      assistantRole: String = "assistant",
      systemRole: String = "system"): Column = {
    val n = coalesce(size(turns), lit(0))
    val roles = transform(turns, t => t.getField("role"))
    val contents = transform(turns, t => t.getField("content"))
    val hasSystem = coalesce(get(roles, lit(0)) === systemRole, lit(false))
    // body = turns minus the single allowed leading system turn
    val body = when(hasSystem, slice(turns, lit(2), greatest(n - 1, lit(0))))
      .otherwise(turns)
    val bRoles = transform(body, t => t.getField("role"))
    val nb = coalesce(size(body), lit(0))
    val startsUser = coalesce(get(bRoles, lit(0)) === userRole, lit(false))
    val endsAssistant =
      coalesce(get(bRoles, nb - 1) === assistantRole, lit(false))
    val rolesOk = nb > 0 && coalesce(
      forall(bRoles, r => r === userRole || r === assistantRole), lit(false))
    val adjEq = zip_with(
      slice(bRoles, lit(1), greatest(nb - 1, lit(0))),
      slice(bRoles, lit(2), greatest(nb - 1, lit(0))),
      (a, b) => a === b)
    // a null role makes the comparison unknown — count it as NOT
    // alternating (rolesOk already failed; never claim health on null)
    val alternates = coalesce(!exists(adjEq, x => x), lit(false))
    val hasEmpty = coalesce(
      exists(contents, c => c.isNull || trim(c) === ""), lit(false))
    val dupPairs = zip_with(
      slice(contents, lit(1), greatest(n - 1, lit(0))),
      slice(contents, lit(2), greatest(n - 1, lit(0))),
      (a, b) => a === b && trim(a) =!= "")
    val dupTurn = coalesce(exists(dupPairs, x => x), lit(false))
    def charsOf(role: String) = coalesce(aggregate(
      filter(body, t => t.getField("role") === role),
      lit(0),
      (acc, t) => acc + coalesce(length(t.getField("content")), lit(0))),
      lit(0))
    struct(
      n.as("n_turns"),
      hasSystem.as("has_system"),
      startsUser.as("starts_user"),
      endsAssistant.as("ends_assistant"),
      rolesOk.as("roles_ok"),
      alternates.as("alternates"),
      hasEmpty.as("has_empty"),
      dupTurn.as("dup_turn"),
      charsOf(userRole).as("user_chars"),
      charsOf(assistantRole).as("assistant_chars"),
      (nb >= 2 && startsUser && endsAssistant && rolesOk && alternates &&
        !hasEmpty && !dupTurn).as("valid"))
  }
}
