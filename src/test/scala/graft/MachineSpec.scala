package graft

import graft.net.{OpcuaClient, OpcuaServer, OpcuaWire, PickAndPlaceMachine}
import graft.net.OpcuaWire._

/** The reference's interactive loop (README.md Test Scenarios 1-4) driven
  * END-TO-END over the live opc.tcp socket: a wire client calls the
  * machine's methods (SimulateError, AcknowledgeAlarms, Start/Stop,
  * maintenance/setup/emergency) and writes feeder levels, the
  * [[PickAndPlaceMachine]] cycle engine reacts exactly like
  * opcua_server/main.py:255-434, and the recorded state stream is
  * confirmed against the BATCH alarm operator (AlarmOps.autoRecoveryOn)
  * — the stream the machine emits is the one the analytics recompute.
  */
class MachineSpec extends SparkSuite {

  private def statusOf(c: OpcuaClient): String =
    c.readValue(StringId(1, "Status")).value.get.v.toString
  private def strOf(c: OpcuaClient, name: String): String =
    c.readValue(StringId(1, name)).value.get.v.toString
  private val Root = StringId(1, "PickAndPlace")

  private def withMachine(f: (PickAndPlaceMachine, OpcuaClient) => Unit): Unit = {
    val server = new OpcuaServer()
    try {
      val machine = new PickAndPlaceMachine(server)
      val client = new OpcuaClient("127.0.0.1", server.port, server.endpointUrl)
      try f(machine, client) finally client.close()
    } finally server.close()
  }

  test("Scenario 1: SimulateError latches Error; AcknowledgeAlarms clears and resumes") {
    withMachine { (machine, c) =>
      assert(statusOf(c) == "Running")
      val (st, _) = c.call(Root, StringId(1, "SimulateError"))
      assert(st == StatusGood)
      // status flips immediately (main.py:455-457), the alarm text lands
      // on the NEXT cycle (pending queue, main.py:452-453,397-404)
      assert(statusOf(c) == "Error")
      machine.cycle()
      val expected = s"Error: Random Fault: ${PickAndPlaceMachine.ErrorTexts.head}"
      assert(strOf(c, "ActiveAlarms") == expected)
      assert(strOf(c, "CurrentError") == expected)
      val (st2, _) = c.call(Root, StringId(1, "AcknowledgeAlarms"))
      assert(st2 == StatusGood)
      assert(statusOf(c) == "Running")
      assert(strOf(c, "CurrentError") == "")
      assert(strOf(c, "ActiveAlarms") == "")
    }
  }

  test("reference quirk: healthy feeders auto-resume a simulated error on the 2nd cycle") {
    withMachine { (machine, c) =>
      c.call(Root, StringId(1, "SimulateError"))
      machine.cycle() // flush: critical push blocks recovery this cycle
      assert(statusOf(c) == "Error")
      machine.cycle() // no pending, feeders > 0 → auto-resume (main.py:411-431)
      assert(statusOf(c) == "Running")
      assert(strOf(c, "CurrentError") == "")
    }
  }

  test("Scenario 2: feeder empty escalates; wire refill auto-resumes; batch op agrees") {
    withMachine { (machine, c) =>
      import graft.ops.AlarmOps
      // the recorded event log the analytics side consumes: one snapshot
      // per step, machine = entity 1, CurrentError → the 'error' metric
      // (>100 = latched), Feeder01..03 → the three feed metrics
      val log = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, String, Double, String)]
      var eid = 0L
      def snapshot(): Unit = {
        val err = if (strOf(c, "CurrentError").isEmpty) 0.0 else 999.0
        val feeds = (1 to 3).map(i =>
          c.readValue(StringId(1, PickAndPlaceMachine.feederName(i)))
            .value.get.v.asInstanceOf[Long].toDouble)
        Seq("error" -> err, "click" -> feeds(0), "view" -> feeds(1), "purchase" -> feeds(2))
          .foreach { case (m, v) =>
            eid += 1
            log += ((eid, f"2024-01-01 00:${eid}%02d:00", 1L, m, v, "{}"))
          }
      }
      def recoverable: Seq[Long] =
        AlarmOps.autoRecoveryOn(eventsDf(log.toSeq)).collect().map(_.getLong(0)).toSeq

      // drain feeder 2 over the wire. The queue flushes ONE alarm per
      // cycle (main.py:397-404) and the low-level info alarm queues ahead
      // of the empty alarm — cycle 1 logs the info, cycle 2 escalates
      assert(c.writeValue(StringId(1, PickAndPlaceMachine.feederName(2)), 0) == StatusGood)
      machine.cycle()
      assert(statusOf(c) == "Running")
      assert(strOf(c, "ActiveAlarms") == "Info: Feeder 02 Low Level (0) - Please Refill!")
      machine.cycle()
      assert(statusOf(c) == "Error")
      assert(strOf(c, "CurrentError") == "Feeder 02 empty")
      snapshot()
      // an empty feed metric blocks recovery — batch op must agree
      assert(recoverable.isEmpty, "batch op flagged an entity with an empty feeder")
      // manual refill over the wire (README Test Scenario 2's UaExpert write)
      assert(c.writeValue(StringId(1, PickAndPlaceMachine.feederName(2)), 500) == StatusGood)
      snapshot()
      // pre-resume state: latched error + healthy feeds = exactly the rows
      // q_auto_recovery exists to surface
      assert(recoverable == Seq(1L), "batch op missed the recoverable machine")
      machine.cycle() // auto-resume (main.py:411-431)
      assert(statusOf(c) == "Running")
      assert(strOf(c, "CurrentError") == "")
      snapshot()
      // recovered: the error metric dropped to 0 → no longer recoverable
      assert(recoverable.isEmpty, "batch op still flags the recovered machine")
    }
  }

  test("Scenarios 3-4: maintenance, setup, emergency stop, restart") {
    withMachine { (machine, c) =>
      c.call(Root, StringId(1, "EnterMaintenance"))
      assert(statusOf(c) == "Maintenance")
      // a maintenance machine does not heartbeat (main.py:267-272 gates on Running)
      val idx0 = c.readValue(StringId(1, "PCBIndexCurrent")).value.get.v
      machine.cycle()
      assert(c.readValue(StringId(1, "PCBIndexCurrent")).value.get.v == idx0)
      c.call(Root, StringId(1, "EnterSetup"))
      assert(statusOf(c) == "Setup")
      c.call(Root, StringId(1, "EmergencyStop"))
      assert(statusOf(c) == "Error")
      c.call(Root, StringId(1, "StartMachine"))
      assert(statusOf(c) == "Running")
      machine.cycle()
      assert(c.readValue(StringId(1, "PCBIndexCurrent")).value.get.v ==
        idx0.asInstanceOf[Long] + 1)
      c.call(Root, StringId(1, "StopMachine"))
      assert(statusOf(c) == "Stopped")
    }
  }

  test("low-level edge: dropping below 200 queues ONE info alarm, re-arms on refill") {
    withMachine { (machine, c) =>
      c.writeValue(StringId(1, PickAndPlaceMachine.feederName(3)), 150)
      machine.cycle()
      assert(strOf(c, "ActiveAlarms") == "Info: Feeder 03 Low Level (150) - Please Refill!")
      // info alarms are NOT critical: no Error transition, no CurrentError
      assert(statusOf(c) == "Running")
      assert(strOf(c, "CurrentError") == "")
      // staying low does not re-fire (edge, not level — main.py:318-332)
      c.writeValue(StringId(1, "ActiveAlarms"), "")
      machine.cycle()
      assert(strOf(c, "ActiveAlarms") == "")
      // refill re-arms, the next drop fires again
      c.writeValue(StringId(1, PickAndPlaceMachine.feederName(3)), 1000)
      machine.cycle()
      c.writeValue(StringId(1, PickAndPlaceMachine.feederName(3)), 100)
      machine.cycle()
      assert(strOf(c, "ActiveAlarms") == "Info: Feeder 03 Low Level (100) - Please Refill!")
    }
  }
}
