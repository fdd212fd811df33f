#!/usr/bin/env bash
# Provision the engine's Kafka topic layout (SURVEY.md §2.1 S12; topology
# mirrors reference scripts/start_kafka.sh:11-86 — 3 partitions per data
# topic, 24h retention — written fresh for this repo).
#
# Usage: scripts/provision_kafka.sh [bootstrap-server]
set -euo pipefail

BOOTSTRAP="${1:-localhost:9092}"
RETENTION_MS=$((24 * 60 * 60 * 1000))

# topic:partitions — data topics get 3, internal/metrics get 1
TOPICS=(
  "banking.transactions.raw:3"
  "banking.transactions.validated:3"
  "banking.transactions.enriched:3"
  "banking.accounts:3"
  "banking.customers:3"
  "banking.alerts:3"
  "banking.transactions.deadletter:3"
  "banking.transactions.retry:3"
  "pipeline.metrics:1"
)

for entry in "${TOPICS[@]}"; do
  topic="${entry%%:*}"
  partitions="${entry##*:}"
  kafka-topics.sh --bootstrap-server "$BOOTSTRAP" \
    --create --if-not-exists \
    --topic "$topic" \
    --partitions "$partitions" \
    --replication-factor 1 \
    --config "retention.ms=${RETENTION_MS}" \
    --config "compression.type=snappy"
  echo "ensured topic $topic (${partitions} partitions)"
done

kafka-topics.sh --bootstrap-server "$BOOTSTRAP" --list
