// WebhookDetail - mirror of pages/WebhookDetail.tsx: header with active
// toggle, metadata grid, and the three tabs (Transform & Filter,
// Reference Tables, User-Defined Functions) with per-row delete actions
// and a UDF code preview.

import {
  h, pageHeader, spinner, snackbar, navigate, toggleSwitch, dataTable,
  codeEditor, fmtDate,
} from "/assets/ui.js";
import { webhookApi, referenceTableApi, udfApi } from "/assets/api.js";

export async function WebhookDetail(main, params) {
  const id = params.id;
  main.append(spinner());

  let webhook, tables = [], udfs = [];
  try {
    [webhook, tables, udfs] = await Promise.all([
      webhookApi.getById(id),
      referenceTableApi.getByWebhookId(id).catch(() => []),
      udfApi.getByWebhookId(id).catch(() => []),
    ]);
  } catch (e) {
    main.replaceChildren(
      h(
        "div",
        { class: "paper", style: "background:#ffebee" },
        h("p", { style: "color:var(--error)" }, `Error loading webhook: ${e.message}`),
        h("button", { class: "btn-contained", onclick: () => navigate("/webhooks") }, "Go Back"),
      ),
    );
    return;
  }

  const refetch = () => {
    main.replaceChildren();
    WebhookDetail(main, params);
  };

  const handleToggle = async () => {
    try {
      await webhookApi.toggleStatus(id, !webhook.active);
      snackbar(`Webhook ${webhook.active ? "deactivated" : "activated"} successfully`, "success");
      refetch();
    } catch (e) {
      snackbar(`Failed to update webhook status: ${e.message}`, "error");
    }
  };

  const deleteTable = async (tableId) => {
    if (!window.confirm("Are you sure you want to delete this reference table?")) return;
    try {
      await referenceTableApi.delete(tableId);
      snackbar("Reference table deleted successfully", "success");
      refetch();
    } catch (e) {
      snackbar(`Failed to delete reference table: ${e.message}`, "error");
    }
  };

  const deleteUdf = async (udfId) => {
    if (!window.confirm("Are you sure you want to delete this UDF?")) return;
    try {
      await udfApi.delete(udfId);
      snackbar("UDF deleted successfully", "success");
      refetch();
    } catch (e) {
      snackbar(`Failed to delete UDF: ${e.message}`, "error");
    }
  };

  const meta = (label, value) =>
    h("div", {}, h("div", { class: "muted", style: "font-size:12px" }, label), h("div", {}, value));

  // -- tabs -----------------------------------------------------------------
  const tabNames = ["Transform & Filter", "Reference Tables", "User-Defined Functions"];
  let tabValue = 0;
  const tabBody = h("div");
  const tabBar = h("div", { class: "tabs" });
  const renderTabs = () => {
    tabBar.replaceChildren(
      ...tabNames.map((t, i) =>
        h(
          "div",
          {
            class: `tab ${i === tabValue ? "active" : ""}`,
            onclick: () => {
              tabValue = i;
              renderTabs();
            },
          },
          t,
        ),
      ),
    );
    tabBody.replaceChildren();
    if (tabValue === 0) {
      tabBody.append(
        h("h3", {}, "Transform Query"),
        codeEditor({ value: webhook.transform_query, readOnly: true, height: "160px", language: "sql" }),
      );
      if (webhook.filter_query) {
        tabBody.append(
          h("h3", { style: "margin-top:16px" }, "Filter Query"),
          codeEditor({ value: webhook.filter_query, readOnly: true, height: "100px", language: "sql" }),
        );
      }
    } else if (tabValue === 1) {
      tabBody.append(
        h(
          "div",
          { class: "row-between", style: "margin-bottom:12px" },
          h("h3", {}, "Reference Tables"),
          h(
            "button",
            {
              class: "btn-contained",
              onclick: () => navigate("/reference-tables/upload", { webhookId: id }),
            },
            "Upload New Table",
          ),
        ),
        dataTable({
          columns: [
            { id: "name", label: "Table Name" },
            { id: "description", label: "Description" },
            { id: "created_at", label: "Created At", format: fmtDate },
            {
              id: "actions",
              label: "Actions",
              align: "right",
              format: (v) =>
                h("button", { class: "btn-outlined error", onclick: () => deleteTable(v) }, "Delete"),
            },
          ],
          rows: tables.map((t) => ({
            name: t.name,
            description: t.description,
            created_at: t.created_at,
            actions: t.id,
          })),
        }),
      );
    } else {
      tabBody.append(
        h(
          "div",
          { class: "row-between", style: "margin-bottom:12px" },
          h("h3", {}, "User-Defined Functions"),
          h(
            "button",
            { class: "btn-contained", onclick: () => navigate("/udfs/new", { webhookId: id }) },
            "Create New UDF",
          ),
        ),
        dataTable({
          columns: [
            { id: "name", label: "UDF Name" },
            { id: "created_at", label: "Created At", format: fmtDate },
            {
              id: "actions",
              label: "Actions",
              align: "right",
              format: (v) =>
                h("button", { class: "btn-outlined error", onclick: () => deleteUdf(v) }, "Delete"),
            },
          ],
          rows: udfs.map((u) => ({
            name: u.name ?? u.function_name,
            created_at: u.created_at,
            actions: u.id,
          })),
        }),
      );
      if (udfs.length) {
        tabBody.append(
          h("h3", { style: "margin-top:20px" }, "UDF Code Example"),
          h("p", { class: "muted" }, "Selected UDF code:"),
          codeEditor({
            value: udfs[0].code ?? udfs[0].function_code ?? "",
            readOnly: true,
            height: "160px",
            language: "python",
          }),
        );
      }
    }
  };
  renderTabs();

  main.replaceChildren(
    pageHeader({
      title: `Webhook: ${webhook.source_path}`,
      buttonText: "Edit",
      buttonPath: `/webhooks/${id}/edit`,
      secondaryButtonText: "Back",
      secondaryButtonPath: "/webhooks",
    }),
    h(
      "div",
      { class: "card" },
      h(
        "div",
        { class: "row-between", style: "margin-bottom:14px" },
        h(
          "h2",
          {},
          webhook.source_path,
          " ",
          h("span", { class: `chip ${webhook.active ? "success" : ""}` }, webhook.active ? "Active" : "Inactive"),
        ),
        toggleSwitch({
          checked: webhook.active,
          label: webhook.active ? "Active" : "Inactive",
          onToggle: handleToggle,
        }),
      ),
      h(
        "div",
        { class: "grid cols3", style: "margin-bottom:18px" },
        meta("Destination URL", webhook.destination_url),
        meta("Owner", webhook.owner ?? ""),
        meta("Created At", fmtDate(webhook.created_at)),
      ),
      tabBar,
      tabBody,
    ),
  );
}
