#!/bin/bash
# Flatten run artifacts into a report directory:
# copies run*/evaluation.txt and run*/train_loss.txt from SOURCE_DIR into
# DEST_DIR as <run>_evaluation.txt / <run>_train_loss.txt.
# Capability parity with reference tools/report_prep.sh (handles both the
# reference's run_* and this framework's runNNN naming).

SOURCE_DIR=$1
DEST_DIR=$2

if [ -z "$SOURCE_DIR" ] || [ -z "$DEST_DIR" ]; then
    echo "Usage: $0 SOURCE_DIR DEST_DIR"
    exit 1
fi

mkdir -p "$DEST_DIR"

for RUN_DIR in "$SOURCE_DIR"/run*; do
    [ -d "$RUN_DIR" ] || continue
    RUN_NAME=$(basename "$RUN_DIR")
    echo "Processing $RUN_NAME..."
    for NAME in evaluation train_loss; do
        if [ -f "$RUN_DIR/$NAME.txt" ]; then
            cp "$RUN_DIR/$NAME.txt" "$DEST_DIR/${RUN_NAME}_$NAME.txt"
            echo "  Copied $NAME.txt to ${RUN_NAME}_$NAME.txt"
        else
            echo "  WARNING: $NAME.txt not found in $RUN_NAME"
        fi
    done
done

echo "Done! All files have been copied and renamed to $DEST_DIR"
