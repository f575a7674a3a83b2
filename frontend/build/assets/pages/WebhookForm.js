// WebhookForm - mirror of pages/WebhookForm.tsx: create/edit form with
// source path / destination / owner fields and SQL editors for the
// transform and optional filter queries, with the same client-side
// required-field validation and snackbar feedback.

import { h, pageHeader, spinner, snackbar, navigate, codeEditor } from "/assets/ui.js";
import { webhookApi } from "/assets/api.js";

export async function WebhookForm(main, params) {
  const id = params.id;
  const isEdit = !!id;
  main.append(
    pageHeader({
      title: isEdit ? "Edit Webhook" : "Register New Webhook",
      buttonText: "Cancel",
      buttonPath: "/webhooks",
    }),
    spinner(),
  );

  const values = {
    source_path: "",
    destination_url: "",
    transform_query: "",
    filter_query: "",
    owner: "",
  };
  if (isEdit) {
    try {
      const w = await webhookApi.getById(id);
      Object.assign(values, {
        source_path: w.source_path,
        destination_url: w.destination_url,
        transform_query: w.transform_query,
        filter_query: w.filter_query || "",
        owner: w.owner || "",
      });
    } catch (e) {
      main.lastChild.replaceWith(
        h(
          "div",
          { class: "paper", style: "background:#ffebee" },
          h("p", { style: "color:var(--error)" }, `Error loading webhook: ${e.message}`),
          h("button", { class: "btn-contained", onclick: () => navigate("/webhooks") }, "Go Back"),
        ),
      );
      return;
    }
  }

  const field = (name, label, placeholder, help) =>
    h(
      "label",
      { class: "field" },
      h("span", { class: "lab" }, `${label} *`),
      h("input", {
        type: "text",
        value: values[name],
        placeholder,
        oninput: (e) => (values[name] = e.target.value),
      }),
      h("div", { class: "help" }, help),
    );

  const validate = () => {
    if (!values.source_path) return snackbar("Source path is required", "error"), false;
    if (!values.destination_url) return snackbar("Destination URL is required", "error"), false;
    if (!values.transform_query) return snackbar("Transform query is required", "error"), false;
    if (!values.owner) return snackbar("Owner is required", "error"), false;
    return true;
  };

  let submitting = false;
  const submit = async (e) => {
    e.preventDefault();
    if (!validate() || submitting) return;
    submitting = true;
    try {
      if (isEdit) {
        await webhookApi.update(id, values);
        snackbar("Webhook updated successfully", "success");
      } else {
        await webhookApi.create(values);
        snackbar("Webhook created successfully", "success");
      }
      navigate("/webhooks");
    } catch (err) {
      snackbar(`Failed to ${isEdit ? "update" : "create"} webhook: ${err.message}`, "error");
      submitting = false;
    }
  };

  main.lastChild.replaceWith(
    h(
      "form",
      { class: "card", onsubmit: submit },
      h(
        "div",
        { class: "grid cols2" },
        field("source_path", "Source Path", "/github-events", "The endpoint path to receive webhooks (e.g., /github-events)"),
        field("destination_url", "Destination URL", "https://example.com/webhook-handler", "Where to forward transformed events"),
        field("owner", "Owner", "team-name", "Team or individual responsible for this webhook"),
      ),
      h("h3", {}, "Transform Query"),
      h("p", { class: "muted" }, "SQL query to transform incoming webhook data. Use {{payload}} as a placeholder for the webhook payload."),
      codeEditor({
        value: values.transform_query,
        height: "200px",
        language: "sql",
        onChange: (v) => (values.transform_query = v),
      }),
      h("h3", { style: "margin-top:18px" }, "Filter Query (Optional)"),
      h("p", { class: "muted" }, "SQL WHERE clause to filter which events get forwarded."),
      codeEditor({
        value: values.filter_query,
        height: "150px",
        language: "sql",
        onChange: (v) => (values.filter_query = v),
      }),
      h(
        "div",
        { class: "right", style: "margin-top:18px" },
        h("button", { class: "btn-contained", type: "submit" }, isEdit ? "Update Webhook" : "Create Webhook"),
      ),
    ),
  );
}
