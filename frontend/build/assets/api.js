// API client - mirror of the reference UI's api/apiClient.ts (same
// endpoints, same response unwrapping, same X-API-Key header on every
// gateway call).  The key is 'default_key' like the reference, overridable
// via localStorage('apiKey') so deployments with a real key can use the UI.

const apiKey = () => localStorage.getItem("apiKey") || "default_key";

async function request(method, url, { json, form } = {}) {
  const headers = { "X-API-Key": apiKey() };
  let body;
  if (json !== undefined) {
    headers["Content-Type"] = "application/json";
    body = JSON.stringify(json);
  } else if (form !== undefined) {
    body = form; // browser sets the multipart boundary
  }
  const res = await fetch(url, { method, headers, body });
  let data = null;
  try {
    data = await res.json();
  } catch {
    /* non-JSON body */
  }
  if (!res.ok) {
    const detail = (data && (data.detail || data.message)) || res.statusText;
    throw new Error(typeof detail === "string" ? detail : JSON.stringify(detail));
  }
  return data;
}

export const webhookApi = {
  getAll: async () => (await request("GET", "/webhooks"))?.webhooks || [],
  getById: (id) => request("GET", `/webhook/${id}`),
  create: (data) => request("POST", "/register", { json: data }),
  update: (id, data) => request("PUT", `/webhook/${id}`, { json: data }),
  // the gateway's delete route (reference backend src/app.py:1705)
  delete: (id) => request("DELETE", `/webhooks/${id}`),
  toggleStatus: (id, active) =>
    request("PATCH", `/webhook/${id}/status`, { json: { active } }),
};

export const referenceTableApi = {
  getAll: async () =>
    (await request("GET", "/reference_tables"))?.reference_tables || [],
  getByWebhookId: async (webhookId) =>
    (await request("GET", `/reference_tables?webhook_id=${encodeURIComponent(webhookId)}`))
      ?.reference_tables || [],
  upload: (formData) => request("POST", "/upload_table", { form: formData }),
  // kept for parity with the reference UI's apiClient; the backend (both
  // engines) exposes no such route, so this surfaces the same error the
  // reference UI shows
  delete: (tableId) => request("DELETE", `/reference_table/${tableId}`),
};

export const udfApi = {
  getAll: async () => (await request("GET", "/udfs"))?.udfs || [],
  getByWebhookId: async (webhookId) =>
    (await request("GET", `/udfs?webhook_id=${encodeURIComponent(webhookId)}`))?.udfs || [],
  register: (formData) => request("POST", "/register_udf", { form: formData }),
  // parity with the reference UI's apiClient (no backend route; see above)
  delete: (udfId) => request("DELETE", `/udf/${udfId}`),
};

export const eventApi = {
  getStats: async () => {
    const d = await request("GET", "/stats");
    if (!d || d.status !== "success") {
      return { received: 0, processed: 0, success_rate: 0, recent_events: [] };
    }
    // derive the dashboard's fields from the gateway's stats shape
    const rates = d.webhook_success_rates || [];
    const total = rates.reduce((a, r) => a + (r.total_events || 0), 0);
    const ok = rates.reduce((a, r) => a + (r.success_count || 0), 0);
    return {
      ...d,
      received: d.raw_event_count ?? 0,
      processed: d.transformed_event_count ?? 0,
      success_rate: total ? ok / total : 0,
    };
  },
  getRecentEvents: async (limit = 10) =>
    (await request("GET", `/events?limit=${limit}`))?.events || [],
};

export const queryApi = {
  executeQuery: (query) => {
    const form = new FormData();
    form.append("query", query);
    return request("POST", "/query", { form });
  },
};

export const testApi = {
  // test POSTs go to the webhook's own path WITHOUT the API key, exactly
  // like the reference UI (ingestion is unauthenticated by design)
  sendWebhook: async (path, payload) => {
    const res = await fetch(path, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(payload),
    });
    const data = await res.json().catch(() => null);
    if (!res.ok) {
      throw new Error((data && data.detail) || res.statusText);
    }
    return data;
  },
  getTransformedEvent: (eventId) =>
    request("GET", `/event/${eventId}/transformed`),
};
