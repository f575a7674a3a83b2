// ReferenceTableUpload - mirror of pages/ReferenceTableUpload.tsx:
// webhook selector (pre-filled when navigated from a webhook detail
// page), table name/description, CSV drop zone with first-10-lines
// preview, the ref_<id>_<name> naming hint, and multipart upload.

import { h, pageHeader, spinner, snackbar, navigate, routeState } from "/assets/ui.js";
import { webhookApi, referenceTableApi } from "/assets/api.js";

export async function ReferenceTableUpload(main) {
  const fromWebhook = routeState().webhookId || "";
  main.append(
    pageHeader({
      title: "Upload Reference Table",
      buttonText: "Cancel",
      buttonPath: fromWebhook ? `/webhooks/${fromWebhook}` : "/reference-tables",
    }),
    spinner(),
  );

  let webhooks = [];
  try {
    webhooks = await webhookApi.getAll();
  } catch {
    /* selector stays empty; submit validation reports it */
  }

  const state = { webhookId: fromWebhook, tableName: "", description: "", file: null };

  const hint = h("code", {}, "ref_<webhook_id>_<table_name>");
  const updateHint = () => {
    const wid = state.webhookId ? state.webhookId.replace(/-/g, "_") : "<webhook_id>";
    hint.textContent = `ref_${wid}_${state.tableName || "<table_name>"}`;
  };
  updateHint();

  const fileInput = h("input", {
    type: "file",
    accept: ".csv,.json",
    style: "display:none",
    onchange: (e) => {
      const f = e.target.files && e.target.files[0];
      if (!f) return;
      state.file = f;
      if (!state.tableName) {
        state.tableName = f.name.split(".")[0];
        nameInput.value = state.tableName;
        updateHint();
      }
      const reader = new FileReader();
      reader.onload = (ev) => {
        preview.textContent = String(ev.target.result || "").split("\n").slice(0, 10).join("\n");
        previewWrap.style.display = "";
      };
      reader.readAsText(f);
      dropLabel.textContent = `Selected file: ${f.name} (${(f.size / 1024).toFixed(2)} KB) - click to change`;
    },
  });

  const dropLabel = h("span", {}, "Click to select a CSV file or drag and drop it here");
  const dropzone = h("div", { class: "dropzone", onclick: () => fileInput.click() }, "⬆ ", dropLabel);
  dropzone.addEventListener("dragover", (e) => e.preventDefault());
  dropzone.addEventListener("drop", (e) => {
    e.preventDefault();
    if (e.dataTransfer.files.length) {
      fileInput.files = e.dataTransfer.files;
      fileInput.dispatchEvent(new Event("change"));
    }
  });

  const preview = h("pre", { class: "json", style: "max-height:200px" });
  const previewWrap = h(
    "div",
    { style: "display:none" },
    h("h3", { style: "margin-top:16px" }, "File Preview"),
    preview,
    h("div", { class: "muted", style: "font-size:12px" }, "Showing first 10 lines of the file"),
  );

  const nameInput = h("input", {
    type: "text",
    value: state.tableName,
    oninput: (e) => {
      state.tableName = e.target.value;
      updateHint();
    },
  });

  const submit = async (e) => {
    e.preventDefault();
    if (!state.webhookId) return snackbar("Please select a webhook", "error");
    if (!state.tableName) return snackbar("Please enter a table name", "error");
    if (!state.file) return snackbar("Please select a file to upload", "error");
    const form = new FormData();
    form.append("webhook_id", state.webhookId);
    form.append("table_name", state.tableName);
    form.append("description", state.description);
    form.append("file", state.file);
    try {
      await referenceTableApi.upload(form);
      snackbar("Reference table uploaded successfully", "success");
      navigate(fromWebhook ? `/webhooks/${state.webhookId}` : "/reference-tables");
    } catch (err) {
      snackbar(`Failed to upload reference table: ${err.message}`, "error");
    }
  };

  main.lastChild.replaceWith(
    h(
      "form",
      { class: "card", onsubmit: submit },
      h(
        "label",
        { class: "field" },
        h("span", { class: "lab" }, "Webhook *"),
        h(
          "select",
          {
            disabled: !!fromWebhook,
            onchange: (e) => {
              state.webhookId = e.target.value;
              updateHint();
            },
          },
          h("option", { value: "" }, "Select a webhook"),
          ...webhooks.map((w) =>
            h("option", { value: w.id, selected: w.id === state.webhookId }, `${w.source_path} (${w.owner ?? ""})`),
          ),
        ),
        h("div", { class: "help" }, "Select the webhook that will use this reference table"),
      ),
      h(
        "div",
        { class: "grid cols2" },
        h(
          "label",
          { class: "field" },
          h("span", { class: "lab" }, "Table Name *"),
          nameInput,
          h("div", { class: "help" }, "Name to identify this table (e.g., users, products)"),
        ),
        h(
          "label",
          { class: "field" },
          h("span", { class: "lab" }, "Description"),
          h("input", { type: "text", oninput: (e) => (state.description = e.target.value) }),
          h("div", { class: "help" }, "Optional description of this table's purpose"),
        ),
      ),
      h("h3", {}, "Upload CSV File"),
      fileInput,
      dropzone,
      previewWrap,
      h(
        "div",
        { class: "alert info", style: "margin-top:16px" },
        "The CSV file should have a header row with column names. In SQL queries, you can access this table using the name: ",
        hint,
      ),
      h(
        "div",
        { class: "right" },
        h("button", { class: "btn-contained", type: "submit" }, "⬆ Upload Table"),
      ),
    ),
  );
}
