#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items 1-6), strictly serial.
#
# Order: (a) compiled-mode validation of the extended Pallas NMS at the
# fast preset's real K=1700 (the round-5 kernel change gates the fast
# preset's live path — if it disagrees on hardware, the fast rows are
# skipped rather than recorded wrong); (b) the 3-seed x 2-regime
# AP-neutrality variance study at the reference's own 1060-image eval size
# (VERDICT items 1+6, the round's top deliverable); (c) a full bench.py so
# the round has a builder-captured artifact even if the driver's end-of-
# round run hits another outage; (d) fast-preset phase split (decode+NMS
# with the Pallas kernel now live at K=1700 — VERDICT item 4); (e) the
# backbone int8 roofline tiebreaker (item 3); (f) batch-1 latency lever
# (item 5).
#
# Each step health-gates on the relay listener and a wall-clock deadline
# (leave the box quiet for the driver's own bench at round end).
set -u
cd /root/repo
LOG=logs_r5
mkdir -p $LOG
DEADLINE=${DEADLINE:-1787143500}

note() { echo "[queue] $* $(date -u +%FT%TZ)" | tee -a $LOG/queue.log; }

gate() {
  if ! ss -tln | grep -q ':8082 '; then note "relay DOWN before $1 — abort"; exit 1; fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then note "past deadline — stop before $1"; exit 0; fi
}

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  gate "$name"
  # never let a step run past the deadline (the driver's own bench needs
  # the box quiet at round end); left<=0 must STOP, not become 'timeout 0'
  # (GNU timeout 0 = unbounded)
  local left=$((DEADLINE - $(date +%s)))
  if [ "$left" -le 0 ]; then note "no time left before $name — stop"; exit 0; fi
  [ "$to" -gt "$left" ] && to=$left
  note "START $name (cap ${to}s)"
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  note "END $name rc=$?"
}

# Gate on the sizes the fast preset actually RUNS (premise audit, round 5):
# decode NMS at the nms_budget_test=1024 working set (kernel-covered since
# round 2) and the 64-box ROI final NMS (newly covered by the padded
# wrapper). K=1792 validates the extension's cap, non-gating.
run nms1024 1800 python tools/nms_bench.py 1024 20
run nms64 900 python tools/nms_bench.py 64 20
if grep -q "agree: True" $LOG/nms1024.log && grep -q "agree: True" $LOG/nms64.log; then
  FASTOK=1; note "pallas NMS @1024+@64 compiled-mode AGREE"
else
  FASTOK=0; note "pallas NMS live-size validation FAILED — fast rows skipped"
fi
run nms1792 900 python tools/nms_bench.py 1792 10

run ablation 10800 python tools/ablation_seeds.py 800 1060

if [ "$FASTOK" = 1 ]; then
  run bench 3600 python bench.py
  run phases 3600 python tools/serving_profile.py 128 10 bf16 --preset serving_vovnet_fast --phases
  # round-5 int8-RESIDENT whole-path serving row (the byte-reduction arm;
  # preset derives from the fast preset, so it shares the Pallas-NMS gate)
  run resident_serv 3600 python tools/serving_profile.py 128 10 bf16 --preset serving_vovnet_int8_resident
  # round-5 TURBO preset (halved decode budgets, AP-neutral on the CPU
  # protocol — logs_r5/resident_ap_full_run1*.log): the decode+NMS lever
  run turbo_serv 3600 python tools/serving_profile.py 128 10 bf16 --preset serving_vovnet_turbo
else
  run bench 3600 env BENCH_FAST=0 python bench.py
fi

run roofline 2400 python tools/roofline_ab.py 128 10
run batch1 3600 env BATCH1_PINNED=1 python tools/batch1_ab.py 100
note "ALL DONE"
