package graft.sources

import graft.streaming.EventStream.Scd2Mark

import java.sql.{Connection, SQLException, Timestamp}

/** Type-2 dimension delivery over JDBC — the write tail of the SCD2
  * stream ([[graft.streaming.EventStream.scd2Marks]]): each mark applies
  * as ONE transaction that closes the user's current row (valid_to =
  * the new version's valid_from, is_current = false) and inserts the new
  * version as current — the Kimball merge a warehouse dimension load
  * performs, with the history itself never rewritten.
  *
  * Idempotency is the (user_id, version) PRIMARY KEY: a replayed mark
  * (at-least-once delivery after a crash) hits SQLState 23505 on the
  * insert and the transaction rolls back to a no-op — the close-update
  * is guarded by `version < ?` so re-applying cannot double-close or
  * close a NEWER row. Out-of-order marks for one user are rejected by
  * the same guard (the stream emits per-user versions in order; a
  * delivery layer that reorders across users is fine — users are
  * independent rows).
  *
  * Crash model mirrors [[JdbcScopeBatchWriter]]: `afterMarkCommit` is
  * the chaos seam a spec overrides to halt the process after N durable
  * commits; recovery = re-running the same marks, with the PK receipt
  * making the replay exact.
  */
class Scd2JdbcWriter(url: String) {

  protected def afterMarkCommit(applied: Long): Unit = ()

  /** Apply marks in order; returns how many were NEWLY applied (replays
    * and stale versions count as skips, not errors). */
  def apply(marks: Seq[Scd2Mark]): Long = {
    val conn = JdbcScopeStore.connect(url)
    var applied = 0L
    try {
      Scd2JdbcWriter.ensureTable(conn)
      conn.setAutoCommit(false)
      marks.foreach { m =>
        if (Scd2JdbcWriter.applyOne(conn, m)) {
          conn.commit()
          applied += 1
          afterMarkCommit(applied)
        } else conn.rollback()
      }
      applied
    } finally {
      try conn.rollback() catch { case _: SQLException => () }
      conn.close()
    }
  }

  /** The current dimension rows (is_current), user-ordered — what a
    * lookup join reads. */
  def currentRows(): Seq[(Long, Long, String, Timestamp)] =
    Scd2JdbcWriter.read(url, onlyCurrent = true)

  /** The full history, (user, version)-ordered. */
  def history(): Seq[(Long, Long, String, Timestamp, Option[Timestamp], Boolean)] =
    Scd2JdbcWriter.readFull(url)
}

object Scd2JdbcWriter {

  private def ensureTable(conn: Connection): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(
      """CREATE TABLE graft_scd2 (
        | user_id BIGINT NOT NULL,
        | version BIGINT NOT NULL,
        | event_type VARCHAR(64),
        | valid_from TIMESTAMP,
        | valid_to TIMESTAMP,
        | is_current BOOLEAN,
        | PRIMARY KEY (user_id, version))""".stripMargin)
    catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
    finally st.close()
  }

  /** One mark, inside the caller's open transaction. Returns false for a
    * replay/stale mark (caller rolls back the partial close-update). */
  private def applyOne(conn: Connection, m: Scd2Mark): Boolean = {
    // out-of-order guard: a mark older than the user's newest stored
    // version is stale (its successor already closed the interval it
    // would open) — inserting it anyway would create a SECOND
    // is_current=true row, since the close-update below only closes
    // versions < this mark's. The PK collision check alone cannot catch
    // this case (the stale version number may never have been applied).
    val newer = conn.prepareStatement(
      "SELECT 1 FROM graft_scd2 WHERE user_id = ? AND version > ?")
    try {
      newer.setLong(1, m.user_id); newer.setLong(2, m.version)
      val rs = newer.executeQuery()
      try { if (rs.next()) return false } finally rs.close()
    } finally newer.close()
    val close = conn.prepareStatement(
      """UPDATE graft_scd2 SET valid_to = ?, is_current = false
        |WHERE user_id = ? AND is_current = true AND version < ?""".stripMargin)
    try {
      close.setTimestamp(1, m.valid_from)
      close.setLong(2, m.user_id); close.setLong(3, m.version)
      close.executeUpdate()
    } finally close.close()
    val ins = conn.prepareStatement(
      """INSERT INTO graft_scd2
        |(user_id, version, event_type, valid_from, valid_to, is_current)
        |VALUES (?, ?, ?, ?, NULL, true)""".stripMargin)
    try {
      ins.setLong(1, m.user_id); ins.setLong(2, m.version)
      ins.setString(3, m.event_type); ins.setTimestamp(4, m.valid_from)
      ins.executeUpdate()
      true
    } catch {
      case e: SQLException if e.getSQLState == "23505" => false // replay
    } finally ins.close()
  }

  private def read(url: String, onlyCurrent: Boolean): Seq[(Long, Long, String, Timestamp)] = {
    val conn = JdbcScopeStore.connect(url)
    try {
      ensureTable(conn)
      val q = conn.prepareStatement(
        "SELECT user_id, version, event_type, valid_from FROM graft_scd2" +
          (if (onlyCurrent) " WHERE is_current = true" else "") +
          " ORDER BY user_id, version")
      try {
        val rs = q.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Timestamp)]
        while (rs.next())
          out += ((rs.getLong(1), rs.getLong(2), rs.getString(3), rs.getTimestamp(4)))
        out.toSeq
      } finally q.close()
    } finally conn.close()
  }

  private def readFull(url: String)
      : Seq[(Long, Long, String, Timestamp, Option[Timestamp], Boolean)] = {
    val conn = JdbcScopeStore.connect(url)
    try {
      ensureTable(conn)
      val q = conn.prepareStatement(
        """SELECT user_id, version, event_type, valid_from, valid_to, is_current
          |FROM graft_scd2 ORDER BY user_id, version""".stripMargin)
      try {
        val rs = q.executeQuery()
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, Timestamp, Option[Timestamp], Boolean)]
        while (rs.next()) {
          val to = Option(rs.getTimestamp(5))
          out += ((rs.getLong(1), rs.getLong(2), rs.getString(3),
            rs.getTimestamp(4), to, rs.getBoolean(6)))
        }
        out.toSeq
      } finally q.close()
    } finally conn.close()
  }
}
