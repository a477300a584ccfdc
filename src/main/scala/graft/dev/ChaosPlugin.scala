package graft.dev

import java.util.{Map => JMap}

import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** Executor-kill fault injector for the round-10 retry-determinism gate
  * (dev/gate.sh GATE_FAULT): every executor that starts under this plugin
  * halts its own JVM after a bounded, executor-id-staggered lifetime —
  * `Runtime.halt`, not `System.exit`, so no shutdown hooks run and no
  * buffers flush: the hardest process death a machine loss can inflict
  * short of a kernel panic. Under `local-cluster` the standalone Worker
  * relaunches the executor, Spark retries the lost tasks (and recomputes
  * lost shuffle output via stage retries), and the gate asserts the full
  * Verify suite still hash-matches DuckDB — operators that are only
  * deterministic on a CLEAN run (partial-attempt side effects, speculation
  * races, order-dependent state) corrupt silently at 1000-executor scale,
  * and this is the one cluster reality the round-9 boundary proof did not
  * cover.
  *
  * Knobs (SparkConf):
  *   - `spark.graft.chaos.periodMs` (default 120000): base lifetime; the
  *     per-executor stagger (id-hash mod) spreads kills so the cluster
  *     loses ~one executor per period/4 instead of all at once.
  *   - `spark.graft.chaos.enabled` (default true when the plugin is
  *     loaded): escape hatch.
  *
  * The stagger is a pure function of the executor id — deterministic
  * re-runs of the same gate see the same kill schedule relative to
  * executor lineage, keeping gate failures reproducible-ish. */
class ChaosPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = null

  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(ctx: PluginContext, extraConf: JMap[String, String]): Unit = {
      val conf = ctx.conf()
      if (!conf.getBoolean("spark.graft.chaos.enabled", defaultValue = true)) return
      val period = conf.getLong("spark.graft.chaos.periodMs", 120000L)
      val id = ctx.executorID()
      if (id == "driver") return
      // floorMod: abs(Int.MinValue) is negative, which would make lifeMs
      // negative and Thread.sleep throw — that executor would never die
      val stagger = Math.floorMod(id.hashCode, 4).toLong * period / 4
      val lifeMs = period / 2 + stagger
      val t = new Thread(() => {
        try Thread.sleep(lifeMs)
        catch { case _: InterruptedException => return }
        System.err.println(
          s"[chaos] executor $id halting after ${lifeMs}ms (injected fault)")
        Runtime.getRuntime.halt(137)
      }, s"graft-chaos-$id")
      t.setDaemon(true)
      t.start()
    }
  }
}
