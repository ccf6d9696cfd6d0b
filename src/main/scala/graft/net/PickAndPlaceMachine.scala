package graft.net

import OpcuaWire.Variant

/** The reference's PickAndPlace machine STATE MACHINE wired onto a live
  * [[OpcuaServer]] — the operator-initiated transitions behind its seven
  * registered methods (opcua_server/main.py:155,205-251) plus the
  * per-cycle alarm/auto-resume engine (main.py:255-434), so the README's
  * interactive Test Scenarios 1-4 (README.md:33-76: error-inject →
  * acknowledge → resume, manual feeder refill → auto-recovery,
  * maintenance/setup entry, emergency stop) can be driven end-to-end
  * over the opc.tcp socket by any Call/Write-speaking client.
  *
  * Deliberately DETERMINISTIC where the reference is random: the cycle
  * skips the decorative metric jitter (rate/accuracy random walks —
  * main.py:270-310, pure noise around targets; the alarm analytics over
  * them are covered by the fixture-driven AlarmOps family) and
  * SimulateError picks the FIRST entry of the reference's error list
  * (main.py:443-449 chooses randomly) — a fixture must replay
  * identically. `cycle()` is a method, not a 1 Hz thread: tests step the
  * clock; a deployment wraps it in its own scheduler exactly like the
  * reference's `asyncio.sleep(1.0)` loop (main.py:263-266).
  *
  * State surface (all reachable over the wire):
  *  - `Status`: Running | Starting | Stopping | Stopped | Maintenance |
  *    Setup | Error (main.py:212-251)
  *  - `ActiveAlarms` / `CurrentError`: the alarm log head and the
  *    critical-error latch (main.py:203-204)
  *  - `Feeder01..04Count`: writable consumable levels — the manual
  *    refill surface (main.py:186-187, Scenario 2)
  *  - `PCBIndexCurrent`: the Running-state heartbeat (main.py:268-272)
  */
final class PickAndPlaceMachine(val server: OpcuaServer) {

  import PickAndPlaceMachine._

  // pending alarms queue + edge/latch state — the reference's
  // _pending_alarms / _feeder_low_state / _feeder_empty_state / _last_push
  // (main.py:128-132,398-434). One lock: handlers run on connection
  // request threads, cycle() on the caller's.
  private val lock = new Object
  private var pending = Vector.empty[(String, Boolean)]
  private val feederLow = Array.fill(Feeders + 1)(false)
  private val feederEmpty = Array.fill(Feeders + 1)(false)
  private var lastPush = false

  // initial variable state (main.py:152-204 defaults, trimmed to the
  // state-machine surface)
  server.put("Status", "Running")
  server.put("ActiveAlarms", "")
  server.put("CurrentError", "")
  server.put("PCBIndexCurrent", 0)
  (1 to Feeders).foreach(i => server.put(feederName(i), 1000))

  private def status: String =
    server.get("Status").map(_.v.toString).getOrElse("")

  private def feederCount(i: Int): Long = server.get(feederName(i)) match {
    case Some(Variant(_, v: Int)) => v.toLong
    case Some(Variant(_, v: Long)) => v
    case Some(Variant(_, v: Double)) => v.toLong
    case _ => 0L
  }

  // ---- the seven methods (main.py:155,205-251,441-457) ----

  server.method("StartMachine") { _ =>
    lock.synchronized { pending = Vector.empty; lastPush = false }
    server.put("CurrentError", "")
    server.put("ActiveAlarms", "")
    server.put("Status", "Starting") // transition visible to subscribers
    server.put("Status", "Running")
    Nil
  }

  server.method("StopMachine") { _ =>
    server.put("Status", "Stopping")
    server.put("Status", "Stopped")
    Nil
  }

  server.method("EnterMaintenance") { _ => server.put("Status", "Maintenance"); Nil }

  server.method("EnterSetup") { _ => server.put("Status", "Setup"); Nil }

  server.method("EmergencyStop") { _ => server.put("Status", "Error"); Nil }

  server.method("AcknowledgeAlarms") { _ =>
    lock.synchronized { pending = Vector.empty; lastPush = false }
    server.put("CurrentError", "")
    server.put("ActiveAlarms", "")
    server.put("Status", "Running")
    Nil
  }

  server.method("SimulateError") { _ =>
    // reference picks randomly from its five fault texts (main.py:443-450);
    // deterministic head here — replayable fixtures
    val msg = s"Random Fault: ${ErrorTexts.head}"
    lock.synchronized { pending :+= (s"Error: $msg", true) }
    server.put("Status", "Error")
    Nil
  }

  /** One reference cycle (main.py:265-434, minus the random metric
    * jitter): Running-state heartbeat, stateful feeder low/empty edge
    * alarms, one pending-alarm flush, the critical-push → Error
    * transition, and the all-feeders-refilled auto-resume.
    */
  def cycle(): Unit = {
    if (status == "Running") {
      server.put("PCBIndexCurrent", (feederCountOf("PCBIndexCurrent") + 1).toInt)
      // stateful low-level check (main.py:318-332): edge-fires once below
      // 200, re-arms at/above — the exact semantics AlarmOps.feederLowEdge
      // recomputes from the event log
      for (i <- 1 to Feeders) {
        val v = feederCount(i)
        lock.synchronized {
          if (v < FeederLowThreshold) {
            if (!feederLow(i)) {
              pending :+= (s"Info: Feeder ${fmt(i)} Low Level ($v) - Please Refill!", false)
              feederLow(i) = true
            }
          } else feederLow(i) = false
        }
      }
    }
    // feeder EMPTY check runs in every state (main.py:388-395)
    for (i <- 1 to Feeders) {
      val v = feederCount(i)
      lock.synchronized {
        if (v <= 0) {
          if (!feederEmpty(i)) {
            pending :+= (s"Feeder ${fmt(i)} empty", true)
            feederEmpty(i) = true
          }
        } else feederEmpty(i) = false
      }
    }
    // one pending alarm per cycle (main.py:397-404) + the push → Error
    // transition (main.py:406-409)
    val (flush, pushed) = lock.synchronized {
      val f = pending.headOption
      f.foreach { case (_, crit) =>
        pending = pending.tail
        if (crit) lastPush = true
      }
      (f, lastPush)
    }
    flush.foreach { case (msg, crit) =>
      server.put("ActiveAlarms", msg)
      if (crit) server.put("CurrentError", msg)
    }
    if (pushed) server.put("Status", "Error")
    // auto-resume (main.py:411-431): Error + no fresh push + every feeder
    // above zero + no pending critical → Running, error cleared
    val resumed = lock.synchronized {
      val ok = !lastPush && status == "Error" &&
        (1 to Feeders).forall(i => feederCount(i) > 0) &&
        !pending.exists(_._2)
      if (ok) pending = Vector.empty
      lastPush = false
      ok
    }
    if (resumed) {
      server.put("Status", "Running")
      server.put("CurrentError", "")
    }
  }

  private def feederCountOf(name: String): Long = server.get(name) match {
    case Some(Variant(_, v: Int)) => v.toLong
    case Some(Variant(_, v: Long)) => v
    case _ => 0L
  }
}

object PickAndPlaceMachine {
  val Feeders = 4
  val FeederLowThreshold = 200L // main.py:322 (Model.FeederLowThreshold's source)

  private def fmt(i: Int): String = f"$i%02d"
  def feederName(i: Int): String = s"Feeder${fmt(i)}Count"

  /** The reference's fault texts (main.py:443-449). */
  val ErrorTexts: Seq[String] = Seq(
    "Emergency Stop Button Pressed",
    "Feeder Jammed",
    "Nozzle Clogged",
    "Vision Camera Failure",
    "Safety Door Open")
}
