#!/usr/bin/env bash
# Prepare the Voicebank-DEMAND dataset at 16 kHz and 24 kHz.
#
# Downloads the official zips, splits speakers p226/p287 off the train set as
# validation (same split as the reference), resamples the 48 kHz originals,
# and verifies the expected file counts (train 10802 / val 770 / test 824
# noisy+clean pairs).
#
# Usage: ./data/prepare_voicebank_demand.sh [target_dir]
set -euo pipefail

TARGET=${1:-data/voicebank_demand}
URL_BASE="https://datashare.ed.ac.uk/bitstream/handle/10283/2791"
FILES=(
    clean_trainset_28spk_wav.zip
    noisy_trainset_28spk_wav.zip
    clean_testset_wav.zip
    noisy_testset_wav.zip
)

mkdir -p "$TARGET/48k" "$TARGET/zips"

echo "=== downloading Voicebank-DEMAND (48 kHz) ==="
for f in "${FILES[@]}"; do
    if [ ! -f "$TARGET/zips/$f" ]; then
        curl -L -o "$TARGET/zips/$f" "$URL_BASE/$f?sequence=1&isAllowed=y"
    fi
done

echo "=== extracting ==="
for f in "${FILES[@]}"; do
    unzip -n -q "$TARGET/zips/$f" -d "$TARGET/48k"
done

# layout: {split}/{clean,noisy}/
mkdir -p "$TARGET/48k/train/clean" "$TARGET/48k/train/noisy" \
         "$TARGET/48k/val/clean" "$TARGET/48k/val/noisy" \
         "$TARGET/48k/test/clean" "$TARGET/48k/test/noisy"
mv "$TARGET/48k/clean_trainset_28spk_wav"/*.wav "$TARGET/48k/train/clean/" 2>/dev/null || true
mv "$TARGET/48k/noisy_trainset_28spk_wav"/*.wav "$TARGET/48k/train/noisy/" 2>/dev/null || true
mv "$TARGET/48k/clean_testset_wav"/*.wav "$TARGET/48k/test/clean/" 2>/dev/null || true
mv "$TARGET/48k/noisy_testset_wav"/*.wav "$TARGET/48k/test/noisy/" 2>/dev/null || true

echo "=== splitting speakers p226 / p287 into validation ==="
for sub in clean noisy; do
    for spk in p226 p287; do
        mv "$TARGET/48k/train/$sub/${spk}"_*.wav "$TARGET/48k/val/$sub/" 2>/dev/null || true
    done
done

echo "=== resampling to 16 kHz and 24 kHz ==="
for fs in 16000 24000; do
    out="$TARGET/$((fs / 1000))k"
    python -m open_universe_tpu.bin.resample "$TARGET/48k" "$out" --fs "$fs"
done

echo "=== verifying file counts ==="
check() {  # dir expected
    n=$(find "$1" -name '*.wav' | wc -l)
    if [ "$n" -ne "$2" ]; then
        echo "ERROR: $1 has $n files, expected $2" >&2
        exit 1
    fi
    echo "OK: $1 ($n files)"
}
for rate in 16k 24k; do
    check "$TARGET/$rate/train/clean" 10802
    check "$TARGET/$rate/train/noisy" 10802
    check "$TARGET/$rate/val/clean" 770
    check "$TARGET/$rate/val/noisy" 770
    check "$TARGET/$rate/test/clean" 824
    check "$TARGET/$rate/test/noisy" 824
done
echo "done."
